"""Neural model layer: the seq2seq actor and its submodules."""

from t2onet_tpu.models.resnet import ResNet  # noqa: F401
from t2onet_tpu.models.encoder import RNNEncoder  # noqa: F401
from t2onet_tpu.models.decoder import DecoderStep  # noqa: F401
from t2onet_tpu.models.actor import Actor  # noqa: F401
