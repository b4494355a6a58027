"""ScalarLogger (reference SummaryWriter replacement, train_seq2seqL1.py:37-38)
and the thin ablation-CLI wrapper."""

import json
import os


def test_scalar_logger_jsonl_roundtrip(tmp_path):
    from t2onet_tpu.cli.common import ScalarLogger

    run = str(tmp_path)
    with ScalarLogger(run) as log:
        log.log(1, op_loss=0.5, param_loss=2.0)
        log.log(2, op_loss=0.25)
    path = os.path.join(run, "metrics.jsonl")
    recs = [json.loads(line) for line in open(path)]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["op_loss"] == 0.5 and recs[0]["param_loss"] == 2.0
    assert "time" in recs[0]

    # append mode: a resumed run extends the same file
    with ScalarLogger(run) as log:
        log.log(3, op_loss=0.125)
    recs = [json.loads(line) for line in open(path)]
    assert [r["step"] for r in recs] == [1, 2, 3]

    # close is idempotent (also runs via __del__)
    log.close()
    log.close()


def test_train_actor_fs_wrapper_forces_fs_only(monkeypatch):
    """The t2onet-L1 ablation CLI must always run the supervised-only
    phase (reference experiments/t2onet-L1/train_actor_fs.py)."""
    from t2onet_tpu.cli import train_actor_fs, train_fivek

    seen = {}
    monkeypatch.setattr(train_fivek, "main", lambda argv: seen.update(a=argv))
    train_actor_fs.main(["--synthetic"])
    assert seen["a"] == ["--synthetic", "--fs_only"]
    train_actor_fs.main(["--fs_only", "--synthetic"])
    assert seen["a"].count("--fs_only") == 1
