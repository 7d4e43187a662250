#!/usr/bin/env python
"""Entry point kept at the repo root for parity with the reference CLI."""
import sys

from wise_tpu.cli.metadata import main

if __name__ == "__main__":
    sys.exit(main())
