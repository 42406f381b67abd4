"""Small general helpers (reference: ``src/approx/utils/general.py``)."""

from __future__ import annotations

import os
import warnings


def check_file(file, ext=None) -> bool:
    if file is None:
        return False
    if not os.path.exists(file):
        warnings.warn(f"{file} does not exist")
        return False
    if not os.path.isfile(file):
        warnings.warn(f"{file} must be a file")
        return False
    if ext and os.path.splitext(file)[1] not in ext:
        return False
    return True


def parse_path(path):
    """Split into (dir, stem, ext)."""
    d = os.path.dirname(path)
    base = os.path.basename(path)
    stem, ext = os.path.splitext(base)
    return d, stem, ext


def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        assert len(x) == 2
        return tuple(x)
    return (x, x)


def is_method_overridden(method: str, base_class: type, derived) -> bool:
    base_method = getattr(base_class, method)
    derived_method = getattr(type(derived) if not isinstance(derived, type) else derived, method)
    return derived_method is not base_method


def device_resident(variables, mesh=None):
    """``(params, state)`` placed on device ONCE.

    Checkpoint-loaded trees carry host numpy leaves, and a jitted call
    re-transfers those host->device on EVERY invocation — on a
    bandwidth-bound link (the axon relay; DCN-fed pools) the re-upload
    dominates the compute being timed/served (review r3f, three call
    sites).  With ``mesh`` the trees land replicated over it in one
    transfer (instead of device-0 then a reshard on first use).
    """
    import jax

    if mesh is not None:
        from convnet_approximater_tpu.parallel.mesh import replicate

        out = replicate({"params": variables["params"],
                         "state": variables.get("state", {})}, mesh)
        return out["params"], out["state"]
    return (jax.device_put(variables["params"]),
            jax.device_put(variables.get("state", {})))


def supports_buffer_donation() -> bool:
    """True on real TPU runtimes; False on CPU/virtual meshes AND on the
    axon relay.

    The relay reports backend ``"tpu"`` (``jax.default_backend()``) but
    REJECTS aliased-buffer executables with a runtime INVALID_ARGUMENT —
    found round 4d when the trainers' donation gates keyed on the
    backend string alone: every TrainHelper/L2Reconstruct step on the
    relay died at its first loss readback.  Detect the relay through the
    platform-version string (and the pinned ``jax_platforms`` config)
    instead.
    """
    import jax

    if jax.default_backend() != "tpu":
        return False
    try:
        if "axon" in str(jax.config.jax_platforms or "").lower():
            return False
        ver = jax.devices()[0].client.platform_version
        return "axon" not in str(ver).lower()
    except Exception:  # conservative: no donation when in doubt
        return False
