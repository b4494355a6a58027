"""Host-side data pipeline: tokenizer, vocabs, FiveK / GIER readers,
synthetic fixtures. Stays off-TPU by design (SURVEY.md §2.11)."""

from t2onet_tpu.data.text import (  # noqa: F401
    load_embedding,
    load_vocab,
    parse_sent,
    txt2idx,
)
