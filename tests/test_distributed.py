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


_MESH_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, "@@REPO@@")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hpvaegan_tpu.parallel import maybe_initialize

    pid = int(sys.argv[1])
    idx, count = maybe_initialize(
        True, coordinator_address=sys.argv[2], num_processes=2,
        process_id=pid)

    # ---- a (data, spatial) mesh spanning BOTH processes ----
    from hpvaegan_tpu.parallel import make_mesh
    mesh = make_mesh((2, 2))  # 4 global devices = 2 procs x 2 local
    assert len(mesh.devices.ravel()) == 4

    # ---- tiny GAN-phase train step sharded over that mesh ----
    from hpvaegan_tpu.core.config import Config
    from hpvaegan_tpu.core.pyramid import Pyramid
    from hpvaegan_tpu.models.registry import (make_discriminator,
                                              make_generator)
    from hpvaegan_tpu.train.optim import (build_d_optimizer,
                                          build_g_optimizer, dparams_view,
                                          gparams_view, hpvaegan_group_plan)
    from hpvaegan_tpu.train.steps import make_hpvaegan_steps
    from hpvaegan_tpu.train.trainer import init_discriminator

    cfg = Config(nfc=4, latent_dim=4, num_layer=1, enc_blocks=1,
                 vae_levels=1, batch_size=2, img_size=12, min_size=6,
                 max_size=12)
    cfg.adjust_scales()
    cfg.ar = 1.0
    pyr = Pyramid.for_video(12, 1.0, 6, 12, cfg.scale_factor_init,
                            cfg.sampling_rates, 24.0)
    key = jax.random.PRNGKey(0)  # same seed in both procs -> same values
    G = make_generator("GeneratorHPVAEGAN", cfg, pyr, 3)
    gvars = G.init(key, 1)
    gvars = G.init_next_stage(gvars, jax.random.fold_in(key, 100))
    scale = 1
    cfg.scale_idx = scale
    D = make_discriminator("WDiscriminator3D", cfg, 3)
    dvars = init_discriminator(D, jax.random.fold_in(key, 1),
                               (2, *pyr.shape3d(scale), 3))
    ml, bl, lrs = hpvaegan_group_plan(cfg, scale, len(gvars["body"]))
    tx_g, opt_g = build_g_optimizer(cfg, gparams_view(gvars), ml, bl, lrs,
                                    cfg.grad_clip)
    tx_d, opt_d = build_d_optimizer(cfg, dparams_view(dvars))
    steps = make_hpvaegan_steps(G, D, cfg, tx_g, tx_d, mesh=mesh)

    # globalize: every process supplies its addressable shards via
    # make_array_from_callback (params replicated, batch data-sharded)
    def globalize(tree, spec):
        def one(a):
            a = np.asarray(a)
            s = NamedSharding(mesh, spec if a.ndim >= 2 else P())
            return jax.make_array_from_callback(a.shape, s,
                                                lambda i, a=a: a[i])
        return jax.tree_util.tree_map(one, tree)

    gvars = globalize(gvars, P())
    dvars = globalize(dvars, P())
    opt_g = globalize(opt_g, P())
    opt_d = globalize(opt_d, P())
    real = globalize(np.asarray(
        jax.random.normal(jax.random.fold_in(key, 2),
                          (2, *pyr.shape3d(scale), 3))), P("data"))
    real_zero = globalize(np.asarray(
        jax.random.normal(jax.random.fold_in(key, 3),
                          (2, *pyr.shape3d(0), 3))), P("data"))
    noise = globalize(np.asarray(
        jax.random.normal(jax.random.fold_in(key, 4),
                          (2, *pyr.shape3d(0), cfg.latent_dim))), P("data"))
    amps = globalize(np.ones((scale + 1,), np.float32), P())
    skey = globalize(np.asarray(jax.random.fold_in(key, 5)), P())

    out = steps["gan_step"](gvars, dvars, opt_g, opt_d, real, real_zero,
                            noise, amps, skey)
    jax.block_until_ready(out)
    m = out[-1]
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(
        jnp.stack([m["errD_real"], m["errG"]]), tiled=True)
    assert np.all(np.isfinite(np.asarray(vals)))
    print(f"proc {pid}: distributed mesh GAN step OK", flush=True)
""")


def test_two_process_mesh_train_step(tmp_path):
    """Composes the jax.distributed ring WITH a mesh-sharded WGAN-GP train
    step (VERDICT r2 item 3c — previously the ring and the mesh step were
    only tested separately): 2 processes x 2 virtual CPU devices run one
    GAN step over a cross-process (data, spatial) mesh."""
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "mesh_worker.py"
    script.write_text(_MESH_WORKER.replace("@@REPO@@", REPO))
    env = dict(os.environ)
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
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: distributed mesh GAN step OK" in out
