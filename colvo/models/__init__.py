"""Model layer (SURVEY.md §2.2, components M1–M5)."""

from colvo.models.encoder import ResNetEncoder, BasicBlock, ENCODER_CHANNELS
from colvo.models.depth_decoder import DepthDecoder, ConvBlock, upsample_nearest
from colvo.models.posenet import PoseNet, PoseDecoder, DCDPFusion
from colvo.models.depthnet import DepthNet, ColVOModel

__all__ = [
    "ResNetEncoder",
    "BasicBlock",
    "ENCODER_CHANNELS",
    "DepthDecoder",
    "ConvBlock",
    "upsample_nearest",
    "PoseNet",
    "PoseDecoder",
    "DCDPFusion",
    "DepthNet",
    "ColVOModel",
]
