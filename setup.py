"""Packaging (reference setup.py was a plain setuptools package).  The native
batch-prep library is built lazily at runtime via g++ (see
convnet_approximater_tpu/data/native.py), so no extension modules here."""
import re

from setuptools import find_packages, setup

with open("convnet_approximater_tpu/__init__.py") as f:
    version = re.search(r'__version__ = "(.*?)"', f.read()).group(1)

setup(
    name="convnet-approximater-tpu",
    version=version,
    description="TPU-native post-training ConvNet approximation framework",
    packages=find_packages(include=["convnet_approximater_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "optax", "pyyaml"],
    include_package_data=True,
    package_data={"convnet_approximater_tpu.data": ["_native/*.cpp"]},
    zip_safe=False,
)
