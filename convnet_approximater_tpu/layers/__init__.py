from .substitution import LAYER, Substitution, build_layer
from .simple_conv import SimpleConv
from .low_rank_conv import (LowRankExpConvV1, LowRankExpConvV2,
                            LowRankExpConvV3, LowRankExpConvV4,
                            SeparableConv)
from .depth_separable_conv import CascadeConv, FixPaddingBias, FixPaddingBias2d, ParallelConv
from .merged_ffn import MergedFFN
from .msca import MSCA, MSCAProfile
from .drop import DropPath, drop_path
from .dummy import DummyLayer
from .quant import QuantConv2d
