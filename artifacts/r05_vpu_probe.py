import json, time
import numpy as np
import kmb_tpu  # noqa
import jax, jax.numpy as jnp
from kmb_tpu.utils import hard_fence

n = 2**13
x = jax.device_put(jnp.asarray(np.random.rand(n, n), jnp.float32) + 0.5)
hard_fence(x)

def chain(fn, reps):
    def f(a):
        y = a
        for _ in range(reps):
            y = fn(y)
        return jnp.sum(y)
    return jax.jit(f)

for name, fn in [
    ("exp2", lambda a: jnp.exp2(-a)),
    ("mul_add", lambda a: a * 0.999 + 0.001),
]:
    rates = {}
    for reps in (64, 512):
        f = chain(fn, reps)
        hard_fence(f(x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); hard_fence(f(x)); best = min(best, time.perf_counter()-t0)
        rates[reps] = best
    # slope between reps isolates per-element cost from the fixed floor
    d_elems = n*n*(512-64)
    d_t = rates[512] - rates[64]
    print(json.dumps({"op": name, "t64": rates[64], "t512": rates[512],
                      "marginal_giga_elems_per_second": d_elems/d_t/1e9}),
          flush=True)

# Measured on the v5e chip (2026-08-21, this round):
#   exp2    marginal rate 122.0 G elems/s
#   mul_add marginal rate 351.4 G elems/s
# (the fixed ~50ms per-call cost is the tunnel round-trip floor; the
# marginal rate between 64 and 512 chained passes isolates the VPU.)
