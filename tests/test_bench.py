"""Smoke tests for bench.py, the driver's benchmark artifact.

These measure nothing; they assert the three bench paths (device-pool
e2e, streaming e2e, extraction) run end to end on tiny shapes so a
refactor cannot silently break the round's benchmark run. bench.py main()
itself is flagship-sized and TPU-targeted, so it is not driven here.
"""

import numpy as np
import pytest

from __graft_entry__ import FLAGSHIP

TINY = dict(
    FLAGSHIP,
    tdnn_layer_size=16,
    num_nodes_pooling_layer=32,
    num_nodes_last_layer=16,
    num_speakers_per_batch=8,
    min_segment_len=200,
    max_segment_len=208,  # 2 length buckets -> 2 compiles per path
    steps_per_dispatch=2,
)
# NUM_SPEAKERS must match bench._bench_egs's synthetic corpus (64 speakers):
# the loader feeds real speaker labels, so a smaller softmax head would get
# out-of-range labels and the smoked step would compute a malformed loss.
DIM, NUM_SPEAKERS = 30, 64


@pytest.mark.slow
def test_bench_e2e_pool_smoke():
    import bench

    rate, spread = bench.bench_e2e_pool(
        TINY, DIM, NUM_SPEAKERS, groups=2, windows=1)
    assert np.isfinite(rate) and rate > 0
    assert len(spread) == 1


@pytest.mark.slow
def test_bench_e2e_stream_smoke():
    import bench

    rate, link_bound, h2d_bw, breakdown = bench.bench_e2e_stream(
        TINY, DIM, NUM_SPEAKERS, groups=2)
    assert np.isfinite(rate) and rate > 0
    assert np.isfinite(link_bound) and link_bound > 0
    assert h2d_bw > 0
    # Shortfall-attribution stages (VERDICT r4 item 5): all finite and
    # positive, and the predicted pipelined rate is the min stage rate.
    for key in ("device_only", "host_assembly_only", "h2d_only",
                "h2d_tuple", "h2d_packed", "predicted_pipelined"):
        assert breakdown[key] > 0, key
    assert breakdown["predicted_pipelined"] == min(
        breakdown["device_only"], breakdown["host_assembly_only"],
        breakdown["h2d_only"])


@pytest.mark.slow
def test_bench_extract_smoke():
    import bench

    emb_rate, frame_rate, flops_per_frame = bench.bench_extract(
        TINY, DIM, NUM_SPEAKERS, n_utts=8, windows=1)
    assert np.isfinite(emb_rate) and emb_rate > 0
    assert frame_rate > emb_rate  # every utterance has >1 frame
    # CPU backend exposes cost analysis too; one fwd frame of even the
    # tiny model costs >1 kFLOP
    assert flops_per_frame is None or flops_per_frame > 1e3


@pytest.mark.slow
def test_bench_extract_device_pipe_smoke():
    import bench

    rate = bench.bench_extract_device_pipe(
        TINY, DIM, NUM_SPEAKERS, n_utts=8, windows=1)
    assert np.isfinite(rate) and rate > 0


@pytest.mark.slow
def test_bench_extract_host_pipe_smoke():
    import bench

    # Same on-disk corpus as the device-pipe bench (the like-for-like pair).
    rate = bench.bench_extract_host_pipe(
        TINY, DIM, NUM_SPEAKERS, n_utts=8, windows=1)
    assert np.isfinite(rate) and rate > 0
