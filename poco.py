"""POCO CLI entry (parity with reference `poco.py`)."""
import sys

from ppsurf_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
