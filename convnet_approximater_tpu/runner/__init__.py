from .base import BaseRunner
from .runner import Runner
from .class_inference import ClassInference
