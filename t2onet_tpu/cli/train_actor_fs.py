"""Ablation trainer: purely supervised (no episode-L1 phase).

Spec: reference experiments/t2onet-L1/train_actor_fs.py (the t2onet-L1
ablation: teacher forcing only, op NLL + param MSE).

  python -m t2onet_tpu.cli.train_actor_fs --synthetic ...
"""

from __future__ import annotations

import sys

from t2onet_tpu.cli import train_fivek


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--fs_only" not in argv:
        argv.append("--fs_only")
    train_fivek.main(argv)


if __name__ == "__main__":
    main()
