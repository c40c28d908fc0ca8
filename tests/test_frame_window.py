"""Frames-schema replay: the device frame window must assemble the exact
stacked feature bytes the self-play search saw (``AtariVecEnv.features_u8``),
for every stored position of every record — including continuation chunks
(pre-chunk lead history), terminal chunks, and episode restarts.

This is the parity gate for learner/frame_window.py, which replaced the
340 MB-per-chunk stacked-feature upload (95% of the round-4 Atari optimize
wall) with on-device stack assembly from single frames.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from minizero_tpu.config import default_config
from minizero_tpu.envs.atari import AtariVecEnv, FakeALE
from minizero_tpu.learner.frame_window import (
    DeviceFrameWindow,
    assemble_features,
    assemble_features_host,
)
from minizero_tpu.selfplay.host_engine import AtariTrajectoryCollector, HostMoveOutput


def _drive(seqlen=4, moves=40, batch=2, length=48, n_step=2, unroll=2):
    """Collect records + their ground-truth stacks from a FakeALE drive."""
    cfg = default_config(
        "atari",
        zero_actor_intermediate_sequence_length=seqlen,
        learner_n_step_return=n_step,
        learner_muzero_unrolling_step=unroll,
    )
    vec = AtariVecEnv(batch, ale_factory=lambda s: FakeALE(seed=s, length=length))
    col = AtariTrajectoryCollector(cfg, vec.spec, batch)
    rs = np.random.RandomState(0)
    gt = [[] for _ in range(batch)]  # per-slot current-episode stacks
    records = []  # (record, expected stacked u8 features for its positions)
    for _ in range(moves):
        stacks = vec.features_u8()  # pre-move ground truth (what search saw)
        frames = vec.newest_frames().copy()
        actions = rs.randint(0, 4, (batch,))
        for i in range(batch):
            gt[i].append(stacks[i])
        rewards = vec.step(actions)
        done = vec.terminals()
        out = HostMoveOutput(
            action=actions.astype(np.int32),
            policy_target=np.zeros((batch, vec.spec.action_size), np.float32),
            root_value=np.zeros(batch, np.float32),
            reward=rewards,
            frames=frames,
            done=done,
            eval_score=np.zeros(batch, np.float32),
            lives_lost=np.zeros(batch, bool),
        )
        finished, _ = col.add_moves(out)
        for fg in finished:
            expect = np.stack(
                gt[fg.slot][fg.abs_start: fg.abs_start + fg.record.length])
            records.append((fg.record, expect))
        for i in vec.reset_done():
            gt[i] = []
    assert records, "drive produced no records"
    return records


@pytest.mark.parametrize("device", [True, False])
def test_assembled_stacks_match_selfplay_features(device):
    records = _drive()
    # both continuation and terminal chunks must be present
    assert any(r.frame_lead > 0 for r, _ in records)
    assert any(r.frame_lead == 0 for r, _ in records)
    bucket = DeviceFrameWindow.BUCKET
    rows = sum(-(-r.frames.shape[0] // bucket) * bucket
               for r, _ in records) + bucket
    fw = DeviceFrameWindow(rows, 96, 96, device=device)
    for rec, _ in records:
        fw.add(rec)
    for rec, expect in records:
        pos = np.arange(rec.length)
        lk = fw.lookup([rec] * rec.length, pos)
        if device:
            got = np.asarray(assemble_features(
                fw.frames, jnp.asarray(lk["frame_idx"]),
                jnp.asarray(lk["frame_valid"]), jnp.asarray(lk["frame_aplane"])))
            assert got.dtype == np.float32
        else:
            got = assemble_features_host(
                fw.frames, lk["frame_idx"], lk["frame_valid"], lk["frame_aplane"])
        np.testing.assert_array_equal(got.astype(np.uint8), expect)


def test_multi_bank_window_parity(monkeypatch):
    """Device rings shard into sub-2^32-element banks (XLA:TPU gather
    operand limit); blocks never straddle banks and gathers stay exact."""
    monkeypatch.setattr(DeviceFrameWindow, "BANK_ROWS", 128)
    records = _drive(moves=30)
    rows = sum(-(-r.frames.shape[0] // 64) * 64 for r, _ in records) * 2 + 256
    fw = DeviceFrameWindow(rows, 96, 96, device=True)
    assert len(fw.frames) >= 3  # genuinely multi-bank
    for rec, _ in records:
        fw.add(rec)
    for rec, expect in records:
        pos = np.arange(rec.length)
        lk = fw.lookup([rec] * rec.length, pos)
        got = np.asarray(assemble_features(
            fw.frames, jnp.asarray(lk["frame_idx"]),
            jnp.asarray(lk["frame_valid"]), jnp.asarray(lk["frame_aplane"])))
        np.testing.assert_array_equal(got.astype(np.uint8), expect)


def test_window_wrap_evicts_oldest_and_guards_lookup():
    records = [r for r, _ in _drive(moves=30)]
    one = -(-records[0].frames.shape[0] // DeviceFrameWindow.BUCKET) \
        * DeviceFrameWindow.BUCKET
    # room for ~2.5 allocations: adding a third wraps/evicts the first
    fw = DeviceFrameWindow(int(one * 2.5), 96, 96, device=False)
    fw.add(records[0])
    fw.add(records[1])
    assert records[0] in fw and records[1] in fw
    fw.add(records[2])  # wraps to 0, overwriting record 0's rows
    assert records[0] not in fw
    assert records[2] in fw
    with pytest.raises(KeyError):
        fw.lookup([records[0]], np.zeros(1, np.int64))
    # surviving entries still resolve
    fw.lookup([records[2]], np.zeros(1, np.int64))


def test_retain_drops_evicted_games():
    records = [r for r, _ in _drive(moves=20)]
    fw = DeviceFrameWindow(100000, 96, 96, device=False)
    for rec in records:
        fw.add(rec)
    fw.retain(records[1:])
    assert records[0] not in fw
    assert all(r in fw for r in records[1:])
