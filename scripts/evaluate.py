#!/usr/bin/env python
"""Reference-compatible entry point (scripts/evaluate.py in the reference).
Thin shim over mggan_tpu.cli.evaluate."""
from mggan_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
