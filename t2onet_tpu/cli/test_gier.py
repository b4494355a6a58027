"""GIER evaluation (reference experiments/t2onet/test_GIER_seq2seqL1.py).

  python -m t2onet_tpu.cli.test_gier --data_mode global+shapeAlign ...
"""

from __future__ import annotations

import sys

from t2onet_tpu.cli import test_fivek
from t2onet_tpu.cli.train_gier import _has_flag, _patch_parser


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    defaults = {
        "--dataset": "GIER",
        "--session": "3",
        "--decoder_max_len": "8",
    }
    for flag, val in defaults.items():
        if not _has_flag(argv, flag):
            argv += [flag, val]
    if not _has_flag(argv, "--data_mode"):
        argv += ["--data_mode", "global+shapeAlign"]
    _patch_parser()
    test_fivek.main(argv)


if __name__ == "__main__":
    main()
