"""Device-resident sample pool: staging, on-device gather parity, training.

The pool stages compressed utterance codes into (virtual-)device memory
once and the train step gathers chunks on-device from host-shipped index
triples (data/device_pool.py) — the TPU-native replacement for streaming
feature bytes every step."""

import random

import jax
import numpy as np
import pytest

from tf_kaldi_speaker_tpu.data.device_pool import DevicePool, gather_chunks
from tf_kaldi_speaker_tpu.kio.reader import FeatureReader
from tf_kaldi_speaker_tpu.ops.cm_dequant_pallas import cm_dequantize_jnp
from tf_kaldi_speaker_tpu.train import checkpoints
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

from test_trainer import TINY


@pytest.fixture(scope="module")
def pool_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("device_pool")
    d = make_fake_data_dir(
        str(root / "train"), num_speakers=8, utts_per_speaker=5, dim=20,
        min_len=120, max_len=200, compress=True, seed=3,
    )
    return root, d


def test_pool_gather_matches_host_decode(pool_env):
    root, d = pool_env
    pool = DevicePool(d["data"], d["spklist"])
    pool.stage()
    assert pool.full_resident

    reader = FeatureReader(d["data"])
    # Every utterance, a random start each: on-device gather + dequant must
    # equal the host partial-read decode exactly (same CM math).
    rng = random.Random(0)
    L = 64
    for i, seg in enumerate(pool.utt_seg):
        n = int(pool.utt_len[i])
        start = rng.randint(0, n - L)
        codes, headers = gather_chunks(
            pool.frames, pool.headers,
            np.array([int(pool.utt_offset[i]) + start], np.int32),
            np.array([i], np.int32), L,
        )
        got = np.asarray(cm_dequant_ref(codes, headers))[0]
        want, _ = reader.read_segment(seg, L, start=start)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    reader.close()
    pool.close()


def cm_dequant_ref(codes, headers):
    return cm_dequantize_jnp(jax.numpy.asarray(codes), jax.numpy.asarray(headers))


def test_pool_sample_group_semantics(pool_env):
    root, d = pool_env
    pool = DevicePool(d["data"], d["spklist"])
    pool.stage()
    rng = random.Random(1)
    K, NS, M, L = 3, 4, 2, 96
    starts, utts, labels = pool.sample_group(rng, K, NS, M, L)
    assert starts.shape == utts.shape == labels.shape == (K, NS * M)
    for k in range(K):
        # speaker-balance: M consecutive rows share a label, speakers unique
        row_labels = labels[k].reshape(NS, M)
        assert all(len(set(r)) == 1 for r in row_labels)
        assert len(set(row_labels[:, 0])) == NS
        for b in range(NS * M):
            u = utts[k, b]
            off, n = int(pool.utt_offset[u]), int(pool.utt_len[u])
            # chunk inside the utterance's own block, utterance longer than L
            assert n > L
            assert off <= starts[k, b] <= off + n - L
            assert int(pool.utt_label[u]) == labels[k, b]
    pool.close()


def test_pool_budget_rotation(pool_env):
    root, d = pool_env
    # Budget ~half the corpus: residency must rotate with the round id.
    reader = FeatureReader(d["data"])
    total = sum(reader.utt2num_frames.values()) * reader.dim
    reader.close()
    pool = DevicePool(d["data"], d["spklist"], budget_bytes=total // 2,
                      rotation_unit="speakers")
    pool.stage(0)
    assert not pool.full_resident
    res0 = set(pool.spk2utts.keys())
    assert 0 < len(res0) < 8
    pool.stage(1)
    res1 = set(pool.spk2utts.keys())
    assert res0 != res1
    pool.close()


def test_pool_rotation_covers_all_speakers_each_cycle(pool_env):
    """Over-budget rotation is a coverage PARTITION: the cycle's R windows
    are disjoint and their union is every speaker, and the next cycle
    covers everything again under a different partition — unlike
    independent per-round subsets, which left epoch coverage to chance
    (measured ~1.5-2.5% absolute EER worse, docs/VALIDATION.md)."""
    root, d = pool_env
    reader = FeatureReader(d["data"])
    total = sum(reader.utt2num_frames.values()) * reader.dim
    reader.close()
    pool = DevicePool(d["data"], d["spklist"], budget_bytes=total // 3,
                      rotation_unit="speakers")
    R = pool.rotation_rounds
    assert R >= 2
    all_spk = set(pool.spk2features.keys())
    seen = set()
    for w in range(R):
        pool.stage(w)
        res = set(pool.spk2utts.keys())
        assert not (seen & res), "windows of one cycle must be disjoint"
        seen |= res
    assert seen == all_spk, "one cycle must cover every speaker"
    seen2 = set()
    parts2 = []
    for w in range(R):
        pool.stage(R + w)  # cycle 1
        parts2.append(frozenset(pool.spk2utts.keys()))
        seen2 |= parts2[-1]
    assert seen2 == all_spk
    pool.close()


def test_pool_utts_rotation_speaker_distribution_and_coverage(pool_env):
    """Utterance-unit rotation (the default): EVERY window holds EVERY
    speaker (the per-step speaker sampling distribution equals full
    residency), one cycle's windows cover every utterance at least once —
    exactly once for speakers with >= R utterances — and each window fits
    the byte budget."""
    root, d = pool_env
    reader = FeatureReader(d["data"])
    dim = reader.dim
    budget = sum(reader.utt2num_frames.values()) * dim // 3
    pool = DevicePool(d["data"], d["spklist"], budget_bytes=budget)
    assert pool.rotation_unit == "utts"
    R = pool.rotation_rounds
    assert R >= 2
    all_spk = set(pool.spk2features.keys())
    all_segs = {
        (spk, seg)
        for spk, segs in pool.spk2features.items() for seg in segs
    }
    for cycle in range(2):
        seen = set()
        counts = {}
        for w in range(R):
            pool.stage(cycle * R + w)
            assert set(pool.spk2utts.keys()) == all_spk, (
                "every speaker must stay resident in every utterance window"
            )
            # window fits the budget (codes + headers)
            used = int(np.sum(pool.utt_len)) * dim + len(pool.utt_seg) * 16 * dim
            assert used <= budget, (used, budget)
            for i, seg in enumerate(pool.utt_seg):
                item = (int(pool.utt_label[i]), seg)
                seen.add(item)
                counts[item] = counts.get(item, 0) + 1
        assert seen == all_segs, "one cycle must cover every utterance"
        for spk, segs in pool.spk2features.items():
            if len(segs) >= R:
                for seg in segs:
                    assert counts[(spk, seg)] == 1, (
                        "speakers with >= R utts must be covered exactly once"
                    )
    reader.close()
    pool.close()


def test_sharded_pool_utts_rotation(pool_env):
    """Sharded pool with utterance-unit rotation: every window stages all
    speakers across the shards, shapes stay fixed, and sampling works."""
    from jax.sharding import Mesh

    from tf_kaldi_speaker_tpu.data.device_pool import ShardedDevicePool
    from tf_kaldi_speaker_tpu.parallel.mesh import DATA_AXIS

    root, d = pool_env
    mesh = Mesh(np.array(jax.devices()[:2]), (DATA_AXIS,))
    reader = FeatureReader(d["data"])
    total = sum(reader.utt2num_frames.values()) * reader.dim
    reader.close()
    pool = ShardedDevicePool(
        d["data"], d["spklist"], mesh, budget_bytes=total // 3)
    assert pool.rotation_unit == "utts"
    R = pool.rotation_rounds
    assert R >= 2
    all_spk = set(pool.spk2features.keys())
    shapes = set()
    rng = random.Random(7)
    for w in range(R + 1):  # into the second cycle
        pool.stage(w)
        shapes.add((pool.frames.shape, pool.headers.shape))
        resident = {spk for sp2u in pool.shard_spk2utts for spk in sp2u}
        assert resident == all_spk
        starts, utts, labels = pool.sample_group(rng, 2, 4, 2, 64)
        assert starts.shape == (2, 8)
    assert len(shapes) == 1
    pool.close()


def test_trainer_pool_rotates_within_epoch(pool_env):
    """Budget-rotated pools swap windows at dispatch-group boundaries
    INSIDE the epoch (one full coverage cycle per epoch), and training
    still converges."""
    root, d = pool_env
    cfg = dict(
        TINY, device_pool=True, pool_sharded=False, steps_per_dispatch=1,
        num_steps_per_epoch=8, pool_budget_mb=0.05,
        save_checkpoints_steps=8, min_segment_len=64, max_segment_len=96,
    )
    params = ParamsPlain(**cfg)
    nnet = str(root / "mrot" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.build("valid", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    pool = t._device_pool
    R = pool.rotation_rounds
    assert R >= 2
    # epoch 0 ended in its LAST window: rounds 0..R-1 were staged in-epoch
    assert pool.resident_round == R - 1
    # epoch 1 starts cycle 1
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    assert pool.resident_round == 2 * R - 1
    assert int(t.state.step) == 16
    assert np.isfinite(t.valid(d["data"], d["spklist"])[0])


def test_trainer_pool_rotation_cycles(pool_env, monkeypatch):
    """pool_rotation_cycles=C runs C coverage cycles per epoch: every
    window of every cycle is staged exactly once, in order, so the corpus
    is interleaved C times per epoch with 1/C the window dwell."""
    from tf_kaldi_speaker_tpu.data import device_pool as dp_mod

    root, d = pool_env
    cfg = dict(
        TINY, device_pool=True, pool_sharded=False, steps_per_dispatch=1,
        num_steps_per_epoch=8, pool_budget_mb=0.07, pool_rotation_cycles=2,
        save_checkpoints_steps=8, min_segment_len=64, max_segment_len=96,
    )
    params = ParamsPlain(**cfg)
    nnet = str(root / "mcyc" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    staged = []
    orig = dp_mod.DevicePool.stage
    monkeypatch.setattr(
        dp_mod.DevicePool, "stage",
        lambda self, r=0: (staged.append(r), orig(self, r))[1])
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    R = t._device_pool.rotation_rounds
    assert R >= 2 and 2 * R <= 8
    # 2 cycles x R windows, staged in order: rounds 0 .. 2R-1.
    assert staged == list(range(2 * R)), (staged, R)
    assert int(t.state.step) == 8
    # next epoch continues with cycles 2 and 3
    staged.clear()
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    assert staged == list(range(2 * R, 4 * R)), (staged, R)


def test_pool_rotation_mid_epoch_resume_correct_window(pool_env, monkeypatch):
    """--cont from a mid-epoch checkpoint resumes in the rotation window
    matching the resumed step (window boundaries align to absolute epoch
    position), so the remainder of the epoch visits exactly the not-yet-
    trained windows — never restarting coverage at window 0."""
    from tf_kaldi_speaker_tpu.data import device_pool as dp_mod

    root, d = pool_env
    cfg = dict(
        TINY, device_pool=True, pool_sharded=False, steps_per_dispatch=1,
        num_steps_per_epoch=8, pool_budget_mb=0.05,
        save_checkpoints_steps=5, min_segment_len=64, max_segment_len=96,
    )
    params = ParamsPlain(**cfg)
    nnet = str(root / "mresume" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], learning_rate=0.05)
    assert int(t.state.step) == 8  # full epoch; crossing checkpoint at 5
    R = t._device_pool.rotation_rounds
    assert R >= 2
    t._device_pool.close()

    t2 = Trainer(params, nnet, dim=20, num_speakers=8)
    t2.build("train", 20, params.loss_func, 8)
    assert t2.load(5) == 5  # simulate a crash after the step-5 checkpoint
    staged = []
    orig = dp_mod.DevicePool.stage
    monkeypatch.setattr(
        dp_mod.DevicePool, "stage",
        lambda self, r=0: (staged.append(r), orig(self, r))[1])
    t2.train(d["data"], d["spklist"], learning_rate=0.05)
    assert int(t2.state.step) == 8
    # epoch 0, so round ids == window ids; windows for steps 5..7 only.
    want = sorted({min(R - 1, R * s // 8) for s in range(5, 8)})
    assert staged == want, (staged, want, R)
    assert staged[0] > 0  # resumed mid-epoch, NOT back at window 0


def test_pool_rotation_keeps_one_device_shape(pool_env):
    """All rotation windows stage into the SAME fixed-capacity device
    arrays (planned from cycle 0 + one-speaker headroom), so the jitted
    train step — which takes the pool arrays as arguments — compiles once
    per bucket length instead of once per (bucket, window). Re-staging a
    window must therefore cost only the H2D copy, never a recompile."""
    root, d = pool_env
    reader = FeatureReader(d["data"])
    total = sum(reader.utt2num_frames.values()) * reader.dim
    reader.close()
    pool = DevicePool(d["data"], d["spklist"], budget_bytes=total // 3)
    R = pool.rotation_rounds
    assert R >= 2
    shapes = set()
    for w in range(2 * R):  # two full cycles (two different partitions)
        pool.stage(w)
        shapes.add((pool.frames.shape, pool.headers.shape))
    assert len(shapes) == 1, "window staging changed the device-array shape"
    pool.close()


def test_pool_close_then_stage_rebuilds(pool_env):
    """close() resets the residency state: a later stage() rebuilds the
    device arrays instead of no-op'ing with frames=None (trainer restart
    flow on a reused pool object)."""
    root, d = pool_env
    pool = DevicePool(d["data"], d["spklist"])
    pool.stage()
    assert pool.frames is not None and pool.full_resident
    pool.close()
    assert pool.frames is None and not pool.full_resident
    pool.stage()  # must rebuild, not early-return
    assert pool.frames is not None
    pool.close()


def test_sharded_pool_budget_honors_min_speakers(pool_env):
    """A budget too small for one speaker per shard still stages: the
    residency selector admits extra (smallest) speakers over budget rather
    than crashing a later rotation round (review finding)."""
    from tf_kaldi_speaker_tpu.data.device_pool import ShardedDevicePool
    from tf_kaldi_speaker_tpu.parallel.mesh import DATA_AXIS, make_mesh

    root, d = pool_env
    mesh = make_mesh()
    S = mesh.shape[DATA_AXIS]
    # ~1.5 speakers' worth of bytes: the plain budget fill would admit < S
    reader = FeatureReader(d["data"])
    total = sum(reader.utt2num_frames.values()) * reader.dim
    reader.close()
    pool = ShardedDevicePool(
        d["data"], d["spklist"], mesh, budget_bytes=max(1, total // 6),
        rotation_unit="speakers")
    for round_id in range(3):
        pool.stage(round_id)
        resident = {
            spk for sp2u in pool.shard_spk2utts for spk in sp2u
        }
        assert len(resident) >= S, (round_id, len(resident))
    pool.close()


def test_sharded_pool_rotation_fixed_shape_and_coverage(pool_env):
    """Sharded-pool rotation: one cycle's windows cover every speaker, and
    every window stages into the same planned per-shard capacity (stable
    device-array shapes — no recompile per window)."""
    from jax.sharding import Mesh

    from tf_kaldi_speaker_tpu.data.device_pool import ShardedDevicePool
    from tf_kaldi_speaker_tpu.parallel.mesh import DATA_AXIS

    root, d = pool_env
    mesh = Mesh(np.array(jax.devices()[:2]), (DATA_AXIS,))
    reader = FeatureReader(d["data"])
    total = sum(reader.utt2num_frames.values()) * reader.dim
    reader.close()
    pool = ShardedDevicePool(
        d["data"], d["spklist"], mesh, budget_bytes=total // 3)
    R = pool.rotation_rounds
    assert R >= 2
    shapes = set()
    seen = set()
    for w in range(R):
        pool.stage(w)
        shapes.add((pool.frames.shape, pool.headers.shape))
        seen |= {spk for sp2u in pool.shard_spk2utts for spk in sp2u}
    assert len(shapes) == 1, "window staging changed the device-array shape"
    assert seen == set(pool.spk2features.keys())
    pool.stage(R)  # next cycle: different partition, same shape
    shapes.add((pool.frames.shape, pool.headers.shape))
    assert len(shapes) == 1
    pool.close()


def test_trainer_device_pool_epoch(pool_env):
    root, d = pool_env
    cfg = dict(
        TINY, device_pool=True, pool_sharded=False, steps_per_dispatch=3,
        num_steps_per_epoch=6,
        save_checkpoints_steps=6, min_segment_len=64, max_segment_len=96,
    )
    params = ParamsPlain(**cfg)
    nnet = str(root / "mpool" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.build("valid", 20, params.loss_func, 8)
    first = t.valid(d["data"], d["spklist"])[0]
    for _ in range(3):
        t.train(d["data"], d["spklist"], learning_rate=0.05)
    after = t.valid(d["data"], d["spklist"])[0]
    assert int(t.state.step) == 18
    assert checkpoints.read_pointer(nnet) == 18
    assert np.isfinite(after)
    assert after < first, (first, after)


def test_sharded_pool_gather_matches_host_decode(pool_env):
    """ShardedDevicePool + shard_map gather == host partial-read decode."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tf_kaldi_speaker_tpu.data.device_pool import ShardedDevicePool
    from tf_kaldi_speaker_tpu.parallel.mesh import DATA_AXIS, make_mesh

    root, d = pool_env
    mesh = make_mesh()
    S = mesh.shape[DATA_AXIS]
    pool = ShardedDevicePool(d["data"], d["spklist"], mesh)
    pool.stage()
    reader = FeatureReader(d["data"])
    rng = random.Random(0)
    L = 64
    starts, utts, labels = pool.sample_group(rng, 1, S, 1, L)

    gather = shard_map(
        lambda pf, ph, st, ut: gather_chunks(pf, ph, st, ut, L),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
    )
    codes, headers = gather(
        pool.frames, pool.headers,
        jax.device_put(starts[0], jax.sharding.NamedSharding(mesh, P(DATA_AXIS))),
        jax.device_put(utts[0], jax.sharding.NamedSharding(mesh, P(DATA_AXIS))),
    )
    got = np.asarray(cm_dequant_ref(np.asarray(codes), np.asarray(headers)))

    # host oracle: map each row's (shard, local utt) back to its segment
    # via the shard index tables
    spk2segs = pool.spk2features
    for r in range(S):
        dshard = r  # one row per shard in this draw
        u = utts[0, r]
        spk = int(pool.shard_utt_label[dshard][u])
        n = int(pool.shard_utt_len[dshard][u])
        seg = next(
            s for s in spk2segs[spk]
            if reader.utt2num_frames[s.split(" ")[0]] == n
        )
        start_local = int(starts[0, r]) - int(pool.shard_utt_offset[dshard][u])
        want, _ = reader.read_segment(seg, L, start=start_local)
        np.testing.assert_allclose(got[r], want, rtol=1e-6, atol=1e-6)
    reader.close()
    pool.close()


def test_trainer_sharded_pool_epoch(pool_env):
    """device_pool on a multi-device mesh auto-shards; training converges."""
    root, d = pool_env
    cfg = dict(
        TINY, device_pool=True, steps_per_dispatch=3, num_steps_per_epoch=6,
        save_checkpoints_steps=6, min_segment_len=64, max_segment_len=96,
    )
    params = ParamsPlain(**cfg)
    nnet = str(root / "mspool" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.build("valid", 20, params.loss_func, 8)
    first = t.valid(d["data"], d["spklist"])[0]
    for _ in range(3):
        t.train(d["data"], d["spklist"], learning_rate=0.05)
    after = t.valid(d["data"], d["spklist"])[0]
    assert int(t.state.step) == 18
    from tf_kaldi_speaker_tpu.data.device_pool import ShardedDevicePool
    assert isinstance(t._device_pool, ShardedDevicePool)
    assert np.isfinite(after) and after < first, (first, after)


def test_sharded_pool_speaker_disjoint_blocks(pool_env):
    """Rows of shard d carry only shard d's speakers, and the shards
    partition the full resident speaker set."""
    from tf_kaldi_speaker_tpu.data.device_pool import ShardedDevicePool
    from tf_kaldi_speaker_tpu.parallel.mesh import DATA_AXIS, make_mesh

    root, d = pool_env
    mesh = make_mesh()
    S = mesh.shape[DATA_AXIS]
    pool = ShardedDevicePool(d["data"], d["spklist"], mesh)
    pool.stage()
    shard_speakers = [set(m.keys()) for m in pool.shard_spk2utts]
    allspk = set().union(*shard_speakers)
    assert len(allspk) == sum(len(s) for s in shard_speakers)  # disjoint
    assert len(allspk) == 8

    rng = random.Random(3)
    starts, utts, labels = pool.sample_group(rng, 2, S, 2, 64)
    rows_per_shard = labels.shape[1] // S
    for k in range(2):
        for dshard in range(S):
            blk = labels[k, dshard * rows_per_shard:(dshard + 1) * rows_per_shard]
            assert set(int(x) for x in blk) <= shard_speakers[dshard]
    pool.close()
