#!/usr/bin/env python
"""Logger smoke test (reference ``scripts/use_logger.py``)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from convnet_approximater_tpu.utils import build_logger, get_logger

build_logger()
get_logger().info("logger works")
