from . import conv
from .layout import hwio_to_oihw, oihw_to_hwio
