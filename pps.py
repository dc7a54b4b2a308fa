"""PPSurf CLI entry (parity with reference `pps.py`).

Usage:
    python pps.py fit -c configs/poco.yaml -c configs/ppsurf.yaml \
        -c configs/ppsurf_50nn.yaml
    python pps.py rec in_pc.ply out_dir/
"""
import sys

from ppsurf_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
