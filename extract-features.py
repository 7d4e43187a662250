#!/usr/bin/env python
"""Entry point kept at the repo root for parity with the reference CLI:
``python extract-features.py DIR --project-dir P``."""
import sys

from wise_tpu.cli.extract_features import main

if __name__ == "__main__":
    sys.exit(main())
