"""Multi-process (multi-host analog) test — SURVEY §2.3: exercise
`jax.distributed.initialize` via parallel.mesh.initialize_distributed with
two OS processes on the CPU backend, build a GLOBAL mesh spanning both
processes' devices, and run one sharded train step. This is the CPU rig for
the real multi-host TPU path (DCN coordination + ICI collectives), which
single-process virtual-device tests cannot cover.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.getcwd())
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from sgrt_tpu.parallel.mesh import (
        RAYS_AXIS, initialize_distributed, make_mesh, replicate)
    initialize_distributed(coordinator=coord, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc  # global devices
    assert len(jax.local_devices()) == 2

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sgrt_tpu.models.gaussians import grid_scene
    from sgrt_tpu.models.camera import Camera
    from sgrt_tpu.parallel.fit import init_state, make_train_step

    mesh = make_mesh()
    scene = grid_scene(2)
    cam = Camera.create(position=(0.0, 0.0, -4.0), width=16, height=16)
    o, dirs_l = cam.rays()

    # Build GLOBAL ray/target arrays from identical per-process host data
    # (every process holds the full frame; each contributes its local shard).
    dirs_np = np.asarray(dirs_l)
    tgt_np = np.zeros((dirs_np.shape[0], 3), np.float32)
    sh = NamedSharding(mesh, P(RAYS_AXIS))
    dirs_g = jax.make_array_from_callback(dirs_np.shape, sh,
                                          lambda idx: dirs_np[idx])
    tgt_g = jax.make_array_from_callback(tgt_np.shape, sh,
                                         lambda idx: tgt_np[idx])
    scene = replicate(mesh, scene)
    o = replicate(mesh, o)

    opt = optax.adam(1e-2)
    step = make_train_step(opt, mesh=mesh, q_block=4, ray_block=64,
                           backend="xla")
    state = init_state(scene, opt)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    state, loss = step(state, o, dirs_g, tgt_g)
    state, loss2 = step(state, o, dirs_g, tgt_g)
    print(f"LOSS {float(loss):.9e} {float(loss2):.9e}", flush=True)
""")


def test_two_process_distributed_train_step(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(CHILD)
    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    # the child selects CPU via the config API; scrub pytest/conftest influence
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), "2", coord],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed processes timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    losses = [l for out in outs for l in out.splitlines() if l.startswith("LOSS")]
    assert len(losses) == 2, outs
    # pmean makes the loss identical across processes; step 2 must decrease
    assert losses[0] == losses[1]
    l1, l2 = (float(x) for x in losses[0].split()[1:])
    assert l2 < l1
