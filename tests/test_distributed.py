"""Multi-process jax.distributed smoke test (SURVEY.md §5.8).

parallel.init_distributed was the one untested code path in the comm
backend: this test launches TWO OS processes, each with 4 virtual CPU
devices, brings them up via jax.distributed.initialize (the same call a
TPU pod / multi-host DCN deployment uses), builds the global 8-device
clips mesh across processes, and runs a cross-process psum plus a sharded
packed encode. Every process must see all 8 global devices and agree on
the psum total.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)

_WORKER = textwrap.dedent("""
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tac import parallel
    from tac.config import CodecConfig

    pid = int(sys.argv[1])
    n = parallel.init_distributed("localhost:" + sys.argv[2],
                                  num_processes=2, process_id=pid)
    assert n == 8, f"global devices {{n}} != 8"
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4

    mesh = parallel.make_mesh(n_clips=8, n_frames=1)

    # cross-process psum: process p contributes 4 shards of value p+1
    local = np.full((4, 8), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("clips")), local)

    from functools import partial
    @partial(jax.shard_map, mesh=mesh, in_specs=P("clips"),
             out_specs=P(), check_vma=False)
    def total(xs):
        return jax.lax.psum(xs.sum(keepdims=True),
                            ("clips", "frames"))[:1, :1]

    got = float(np.asarray(jax.jit(total)(garr))[0, 0])
    assert got == 8 * (4 * 1.0 + 4 * 2.0), got

    # sharded packed encode across the two processes
    cfg = CodecConfig(sample_rate=16000, n_channels=1, bitrate_bps=64000,
                      n_mdct_lines=64, use_psy=False, alloc_mode="uniform",
                      precision="fast")
    rng = np.random.default_rng(pid)
    xloc = 0.3 * rng.standard_normal((4, 1, 8 * 64)).astype(np.float32)
    xg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("clips")), xloc)
    words, nbits = parallel.encode_batch_packed_sharded(xg, cfg, mesh)
    nb_local = np.asarray(
        [s.data.min() for s in nbits.addressable_shards])
    assert nb_local.min() > 0
    print("DISTOK", pid, got)
""")


@pytest.mark.skipif(os.environ.get("TAC_SKIP_DIST") == "1",
                    reason="distributed smoke disabled")
def test_two_process_distributed_bringup(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon" not in p])
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    env.pop("JAX_ENABLE_X64", None)

    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        assert "DISTOK" in out
