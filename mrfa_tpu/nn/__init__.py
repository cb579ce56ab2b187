from mrfa_tpu.nn.norm import BatchNorm, LayerNorm
from mrfa_tpu.nn.blocks import (
    conv2d,
    dense,
    SameBlock2d,
    DownBlock2d,
    UpBlock2d,
    ResBlock2d,
    ChannelBlock2d,
    Encoder,
    Decoder,
    Hourglass,
)
from mrfa_tpu.nn.resnet import ResNet18
from mrfa_tpu.nn.vgg import Vgg19
