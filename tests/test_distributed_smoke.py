"""Two-process jax.distributed smoke test.

parallel/distributed.py wraps the one-call multi-host setup; everything
else in parallel/ is exercised on the virtual single-process mesh, but
the initialize path itself needs real separate processes: two CPU
processes rendezvous at a local coordinator, form a 2-device global mesh
(1 local device each), and run a cross-process psum (rides gloo on CPU;
ICI/DCN on TPU pods). This is the multi-process testing pattern
SURVEY.md section 4 calls for without needing a cluster.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_enhancement_by_s3prl_tpu.parallel.distributed import (
    initialize_distributed,
    topology_summary,
)

pid = int(sys.argv[1])
port = sys.argv[2]
assert initialize_distributed(f"localhost:{{port}}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

mesh = Mesh(np.array(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))
x = jax.make_array_from_process_local_data(
    sharding, np.asarray([float(pid + 1)], np.float32), (2,)
)
y = jax.jit(
    lambda v: v.sum(), in_shardings=sharding,
    out_shardings=NamedSharding(mesh, P()),
)(x)
total = float(np.asarray(jax.device_get(y)))
assert total == 3.0, total
print(f"WORKER_OK {{pid}} psum={{total}} | {{topology_summary()}}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    env.pop("XLA_FLAGS", None)      # no inherited virtual-device forcing

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {pid} failed:\n{err[-2000:]}"
        assert f"WORKER_OK {pid} psum=3.0" in out, (pid, out, err[-500:])
        assert "process 0/2" in out or "process 1/2" in out
