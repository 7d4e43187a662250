#!/usr/bin/env python
"""Merge per-worker ingest projects (see extract-features.py
--ingest-workers) into one project."""
import sys

from wise_tpu.cli.merge_projects import main

if __name__ == "__main__":
    sys.exit(main())
