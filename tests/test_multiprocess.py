"""Two-process localhost jax.distributed smoke test (VERDICT round-1
missing #5 / item 7): exercises the process-level code paths that the
8-virtual-device single-process mesh cannot — process_count()>1 cursor
striding and a cross-process collective."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address="localhost:29571",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    # per-process cursor striding: disjoint interleaved case subsequences
    sys.path.insert(0, os.environ["REPO_DIR"])
    from brats2019_tpu.data.pipeline import CaseCursor
    cur = CaseCursor(10, seed=3, stride=jax.process_count(),
                     offset=jax.process_index())
    seen = []
    while cur.epoch == 0:
        seen.append(cur.next_index())
    print(f"PROC{pid}:SEEN:{sorted(seen)}", flush=True)

    # cross-process collective: psum over the 2-device global mesh
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    mesh = Mesh(np.array(jax.devices()), ("data",))
    local = jax.device_put(
        jnp.array([float(pid + 1)]), jax.local_devices()[0]
    )
    garr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("data")), [local]
    )
    summed = jax.shard_map(
        lambda x: jax.lax.psum(x, "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
    total = jax.jit(summed)(garr)
    val = float(np.asarray(total.addressable_data(0))[0])
    assert val == 3.0, val  # 1 + 2 summed across processes
    print(f"PROC{pid}:PSUM:OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # one CPU device per process, 2 global
    env["JAX_PLATFORMS"] = "cpu"
    env["REPO_DIR"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"PROC{pid}:PSUM:OK" in out
    # the two processes covered disjoint halves of the epoch
    import re

    seen = {}
    for pid, out in enumerate(outs):
        m = re.search(rf"PROC{pid}:SEEN:\[(.*?)\]", out)
        assert m, out
        seen[pid] = set(int(v) for v in m.group(1).split(","))
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == set(range(10))
