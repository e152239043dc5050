"""Multi-process distributed backend tests (SURVEY §5.8, VERDICT r1 item 7).

Two layers:
* a REAL two-process ``jax.distributed`` smoke test — coordinator on
  localhost, 2 CPU processes x 2 virtual devices each, a cross-process
  psum through a jitted sharded computation;
* unit tests of the ``maybe_initialize`` failure-propagation contract
  (only the benign "already initialized" error is swallowed).
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, "@@REPO@@")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpvaegan_tpu.parallel import maybe_initialize

    pid = int(sys.argv[1])
    nproc = 2
    idx, count = maybe_initialize(
        True, coordinator_address=sys.argv[2], num_processes=nproc,
        process_id=pid)
    assert (idx, count) == (pid, nproc), (idx, count)
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    # cross-process collective: global sum over a device-sharded array
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
    n = len(jax.devices())
    x = jax.make_array_from_callback(
        (n,), NamedSharding(mesh, P("data")),
        lambda idx_: np.arange(n, dtype=np.float32)[idx_])
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(x)
    expect = n * (n - 1) / 2
    assert float(total) == expect, (float(total), expect)
    print(f"proc {pid}: global sum over {n} devices OK", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@@REPO@@", REPO))
    env = dict(os.environ)
    # replace (don't append to) the suite's 8-device flag: 2 local devices
    # per process
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: global sum over 4 devices OK" in out


def test_maybe_initialize_propagates_real_failures(monkeypatch):
    """A half-initialized pod must fail fast, not train N divergent runs."""
    import jax

    from hpvaegan_tpu.parallel import maybe_initialize

    def boom(**kw):
        raise RuntimeError("connection to coordinator failed")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator failed"):
        maybe_initialize(True)


def test_maybe_initialize_swallows_already_initialized(monkeypatch):
    import jax

    from hpvaegan_tpu.parallel import maybe_initialize

    def benign(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", benign)
    idx, count = maybe_initialize(True)
    assert (idx, count) == (jax.process_index(), jax.process_count())


def test_maybe_initialize_noop_when_disabled():
    import jax

    from hpvaegan_tpu.parallel import maybe_initialize

    idx, count = maybe_initialize(False)
    assert (idx, count) == (jax.process_index(), jax.process_count())
