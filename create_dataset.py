"""Force-generate a dataset locally: `python create_dataset.py --dataset D`.

(reference create_dataset.py:1-9)
"""

import argparse

from kmb_tpu.datasets import DATASETS, get_dataset_fn

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=DATASETS.keys(), required=True)
    args = parser.parse_args()
    fn = get_dataset_fn(args.dataset)
    DATASETS[args.dataset](fn)
    print(f"Wrote {fn}")
