from .module_filter import FILTER, ModuleFilter, build_filter
from .simple_conv_filter import SimpleConvFilter
from .indices_filter import IndicesFilter
from .kernel_size_filter import KernelSizeFilter
from .depthwise_conv_filter import DepthwiseConvFilter
from .dense_kxk_filter import DenseKxKFilter
