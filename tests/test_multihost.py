"""Multi-HOST data parallelism, simulated as 2 CPU processes (VERDICT r1 #29,
STATUS gap: 'multi-host wired but untested').

Two processes × 4 virtual devices = an 8-device global ('data','fsdp') mesh
with gloo cross-process collectives — the CPU analog of a 2-host TPU pod
slice over ICI/DCN.  Each process feeds DIFFERENT local batches (per-host
loading); the gradient reduction must keep the replicas bit-identical, which
also pins two easy-to-regress invariants:

- ``shard_batch`` assembles process-local batches with
  ``jax.make_array_from_process_local_data`` (``device_put`` would treat the
  local shard as the global array),
- the device-side step rng is derived from global_seed only (a per-process
  offset would desync the SPMD replicas).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_data_parallel_stays_in_sync(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own platform/flags
    env["SYNFMC_TEST_LOG_DIR"] = str(tmp_path)
    env["SYNFMC_TEST_CKPT_DIR"] = str(tmp_path / "ckpts")
    port = "29517"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join("tests", "_multihost_worker.py"), str(i), "2", port],
            cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        # cold compile of the fsdp-sharded steps across 2 procs on one core
        # can take ~15 min; warm (.jax_cache_cpu) runs finish in ~3
        out, err = p.communicate(timeout=1700)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    lines = [
        [ln for ln in o.splitlines() if ln.startswith("step ")]
        for o in outs
    ]
    assert len(lines[0]) == 2, outs[0]
    # replicas must agree exactly: same loss (global batch) and same updated
    # trainable checksum on both processes after every step
    assert lines[0] == lines[1], f"\nproc0: {lines[0]}\nproc1: {lines[1]}"

    # sp (frame-axis) sharded step: 2-axis P('data','sp') batch assembled
    # from process-local data; both ranks must see the identical loss
    sp_lines = [[ln for ln in o.splitlines() if ln.startswith("sp loss=")] for o in outs]
    assert sp_lines[0] and sp_lines[0] == sp_lines[1], (
        f"\nproc0: {sp_lines[0]}\nproc1: {sp_lines[1]}")

    # stage-1 and stage-3 steps on the same process-spanning mesh (VERDICT r3
    # #4): identical losses + updated-trainable checksums on both ranks
    for prefix in ("lora ", "obj "):
        st = [[ln for ln in o.splitlines() if ln.startswith(prefix)] for o in outs]
        assert st[0] and st[0] == st[1], f"{prefix}\nproc0: {st[0]}\nproc1: {st[1]}"

    # ZeRO-checkpoint path (VERDICT r3 weak #4): both ranks assemble the same
    # host tree from the fsdp-spanning layout; rank 0 round-trips it via Orbax
    ck = [[ln for ln in o.splitlines() if ln.startswith("ckpt csum=")] for o in outs]
    assert ck[0] and ck[0] == ck[1], f"\nproc0: {ck[0]}\nproc1: {ck[1]}"
    assert "ckpt roundtrip ok" in outs[0]

    # collective preemption stop (ADVICE r4): a signal on one rank stops all
    # ranks; no signal stops none — the training loop's break decision is
    # this collective, so ranks cannot desync at the save path
    assert all("preempt stop sync ok" in o for o in outs)

    # per-rank log files (utils/util.py:108-116): rank 0 -> log.txt,
    # rank 1 -> log.txt.rank1 — non-main logs must not vanish
    assert (tmp_path / "log.txt").exists()
    assert (tmp_path / "log.txt.rank1").exists()
    assert "rank 1" in (tmp_path / "log.txt.rank1").read_text()
