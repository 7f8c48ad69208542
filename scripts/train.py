#!/usr/bin/env python
"""Reference-compatible entry point (mggan/model/train.py __main__ in the
reference). Thin shim over mggan_tpu.cli.train."""
from mggan_tpu.cli.train import main

if __name__ == "__main__":
    main()
