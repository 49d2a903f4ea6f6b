"""Multi-process multi-host test: 2 CPU processes via jax.distributed on
localhost (SURVEY.md §4: "multi-host tests via ... jax.distributed local
multiprocess — the standard way to test pod code without a pod")."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, {repo!r})
    from gaplac_tpu.parallel.multihost import maybe_initialize, global_chain_mesh

    ok = maybe_initialize()
    assert ok, "GAPLAC_COORDINATOR should trigger initialization"
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp

    mesh = global_chain_mesh()
    assert mesh.devices.size == 4  # 2 procs x 2 local devices

    # a real cross-process collective: allgather each process's index
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(jnp.ones(()) * jax.process_index())
    assert float(gathered.sum()) == 1.0  # 0 + 1
    print("MULTIHOST_OK", jax.process_index(), jax.process_count())
    """
)


@pytest.mark.skipif(os.environ.get("GAPLAC_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=os.path.dirname(os.path.dirname(__file__))))

    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            GAPLAC_COORDINATOR=f"127.0.0.1:{port}",
            GAPLAC_NUM_PROCESSES="2",
            GAPLAC_PROCESS_ID=str(pid),
        )
        env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin out
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\nstdout={out}\nstderr={err[-2000:]}"
        assert "MULTIHOST_OK" in out
