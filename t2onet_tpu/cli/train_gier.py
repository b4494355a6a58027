"""GIER trainer (reference experiments/t2onet/train_GIER_seq2seqL1.py).

Same alternating protocol as the FiveK trainer with GIER's dict batches,
data-mode intersection filtering, session 3, op horizon 8, 20k iters.

  python -m t2onet_tpu.cli.train_gier --data_mode global+shapeAlign ...
"""

from __future__ import annotations

import sys

from t2onet_tpu.cli import train_fivek


def _has_flag(argv, flag):
    """True if argv sets `flag`, in either '--f v' or '--f=v' form."""
    return any(s == flag or s.startswith(flag + "=") for s in argv)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    defaults = {
        "--dataset": "GIER",
        "--session": "3",
        "--num_iters": "20000",
        "--decoder_max_len": "8",
    }
    for flag, val in defaults.items():
        if not _has_flag(argv, flag):
            argv += [flag, val]
    # GIER-specific knobs consumed by common.build_dataset_and_vocab
    if not _has_flag(argv, "--data_mode"):
        argv += ["--data_mode", "global+shapeAlign"]
    _patch_parser()
    train_fivek.main(argv)


def _patch_parser():
    """Extend the base parser with GIER-only flags."""
    import argparse

    from t2onet_tpu.cli import common

    orig = common.add_base_args

    def add_base_args(p: argparse.ArgumentParser):
        orig(p)
        p.add_argument("--data_mode", default="global+shapeAlign",
                       help="'+'-combined filters: valid/shapeAlign/"
                            "shapeAlign_nonCrop/global/full")
        p.add_argument("--is_load_mask", type=int, default=0)
        return p

    common.add_base_args = add_base_args


if __name__ == "__main__":
    main()
