#!/usr/bin/env python
"""Name-parity alias for the reference's ``threadpool_test.py``: on TPU the
intra-rank thread-parallelism analog is batch width — see
``batched_matvec_test.py`` (same CLI: N S M W)."""
import sys

from batched_matvec_test import main

if __name__ == '__main__':
    main(*[int(a) for a in sys.argv[1:]])
