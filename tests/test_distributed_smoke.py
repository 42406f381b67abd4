"""Multi-host smoke (VERDICT r2 #9): a real 2-process CPU rendezvous through
``parallel/distributed.py::initialize_distributed`` — the only path
``dist_main.sh`` otherwise exercises.  Each subprocess initializes JAX
distributed against a localhost coordinator, asserts the global process
count/identity, and runs a cross-process psum over both hosts' devices."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    from convnet_approximater_tpu.parallel import (
        initialize_distributed, is_main_process, process_count)

    addr, pid = sys.argv[1], int(sys.argv[2])
    initialize_distributed(coordinator_address=addr, num_processes=2,
                           process_id=pid)
    assert process_count() == 2, process_count()
    assert is_main_process() == (pid == 0)
    assert len(jax.devices()) == 2 * jax.local_device_count()

    # cross-process collective: psum of per-process ranks over all devices
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np

    mesh = Mesh(np.array(jax.devices()), ("data",))
    local = jax.make_array_from_callback(
        (len(jax.devices()),), NamedSharding(mesh, P("data")),
        lambda idx: np.full((1,), float(pid), np.float32))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(local)
    # one device per process by default: sum of ranks = 0 + 1
    expect = sum(r * jax.local_device_count() for r in range(2))
    assert float(total) == float(expect), (float(total), expect)
    print(f"rank {pid} OK", flush=True)
""")


def test_two_process_cpu_rendezvous(tmp_path):
    with socket.socket() as s:  # grab a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself
    env["JAX_NUM_CPU_DEVICES"] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), addr, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=100)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out}"
        assert f"rank {pid} OK" in out
