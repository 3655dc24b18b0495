import json, time
import numpy as np
import kmb_tpu  # noqa
import jax, jax.numpy as jnp
from kmb_tpu.utils import hard_fence

for mb in (16, 128):
    a = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
    t0 = time.perf_counter()
    d = jax.device_put(a); hard_fence(d)
    t = time.perf_counter() - t0
    print(json.dumps({"mb": mb, "seconds": t, "MB_per_s": mb / t}), flush=True)

# Measured on the axon-tunneled v5e (2026-08-21): 16MB at 8.4 MB/s,
# 128MB at 20.5 MB/s host->device.  Staging a 411MB point cloud is
# ~25s — a fixed per-shape cost the bench amortizes via _staged_arrays.
