"""Process-0 gated logging.

Rebuild of ``/root/reference/src/approx/utils/logger.py``: ``get_logger``
returns the real logger on the primary process and a no-op ``DummyLogger``
elsewhere.  Rank gating uses ``jax.process_index()`` (the SPMD equivalent of
the reference's ``cfg.local_rank == 0`` check) with a lazy import so the
module can be used before JAX initialises.
"""

from __future__ import annotations

import logging
import sys

_LOGGER_NAME = "convnet_approximater_tpu"


class DummyLogger:
    """Swallows all logging calls on non-primary processes."""

    def noop(self, *args, **kwargs):
        pass

    debug = info = warning = error = critical = exception = log = noop


_dummy = DummyLogger()


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def get_logger():
    if _is_primary():
        return logging.getLogger(_LOGGER_NAME)
    return _dummy


def build_logger(log_file=None, level=logging.INFO):
    """Attach stream (+ optional file) handlers to the framework logger."""
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger
