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


TRAIN_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_enhancement_by_s3prl_tpu.parallel.distributed import (
    initialize_distributed,
)
from speech_enhancement_by_s3prl_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
)
from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.models.upstream import DummyUpstream
from speech_enhancement_by_s3prl_tpu.objectives import build_objective
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.runner.optim import build_optimizer
from speech_enhancement_by_s3prl_tpu.runner.trainer import StepBuilder

pid = int(sys.argv[1])
port = sys.argv[2]
assert initialize_distributed(f"localhost:{{port}}", 2, pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

feat_list = [get_feat_config("linear", 0) for _ in range(3)] + [
    get_feat_config("phase", 0), get_feat_config("linear", 1),
    get_feat_config("phase", 1),
]
pre = OnlinePreprocessor(feat_list=feat_list)
pre.channel_inp, pre.channel_tar = 0, 1
model = build_head("LSTM", input_size=201, output_size=201, hidden_size=8,
                   num_layers=1, bidirectional=False)
builder = StepBuilder(
    preprocessor=pre, model=model, objective=build_objective("L1"),
    optimizer=build_optimizer("Adam", 1e-3, 0.07, 100),
    upstream=DummyUpstream(201), from_waveform=False, from_rawfeature=True,
    eval_metrics=(),
)

rng = jax.random.PRNGKey(0)  # same key on every process: replicated init
T = 4000
local = np.asarray(
    jax.random.normal(jax.random.PRNGKey(10 + pid), (4, 3, T), jnp.float32)
    * 0.1
)
state = builder.init_state(rng, jnp.asarray(local[:2]), jnp.asarray([T, T]))

mesh = make_mesh(8)  # spans both processes (4 local devices each)
step, state = make_parallel_train_step(builder, mesh, state)

wavs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None, None)), local, (8, 3, T)
)
lengths = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.full((4,), T, np.int32), (8,)
)

losses = []
for i in range(3):
    state, stats = step(state, wavs, lengths, jax.random.PRNGKey(100 + i))
    losses.append(float(np.asarray(jax.device_get(stats["loss"]))))
gn = float(np.asarray(jax.device_get(stats["grad_norm"])))
assert all(np.isfinite(v) for v in losses) and np.isfinite(gn)
print(f"TRAIN_OK {{pid}} losses={{','.join(f'{{v:.6f}}' for v in losses)}} "
      f"grad_norm={{gn:.6f}}", flush=True)
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


def test_two_process_mesh_training(tmp_path):
    """Multi-HOST data-parallel training: two processes with 4 virtual
    devices each form one global ('data','model')=(8,1) mesh and run the
    REAL parallel train step (parallel/mesh.py). Each host feeds its own
    local batch shard; GSPMD's gradient psum crosses the process
    boundary, so both hosts must see identical global loss/grad-norm."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(TRAIN_WORKER.format(repo=REPO))
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)

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
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    lines = []
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {pid} failed:\n{err[-2000:]}"
        ok = [ln for ln in out.splitlines() if ln.startswith(f"TRAIN_OK {pid}")]
        assert ok, (pid, out, err[-500:])
        lines.append(ok[0].split(" ", 2)[2])
    # the loss/grad-norm stats are global scalars: identical on both hosts
    assert lines[0] == lines[1], lines
