"""Main entry point: `python run.py --dataset ... [--local]`.

See kmb_tpu/main.py for the orchestrator (reference run.py:1-10).
"""

from multiprocessing import freeze_support

from kmb_tpu.main import main

if __name__ == "__main__":
    freeze_support()
    main()
