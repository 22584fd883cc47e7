"""tfks-validate-data-dir: native utils/validate_data_dir.sh checks
(/root/reference/egs/sre/v1/run.sh:76-84 runs it with --no-text
--no-feats after every corpus combine)."""

import os

import pytest

from tf_kaldi_speaker_tpu.cli.validate_data_dir import (
    ValidationError, main, validate_data_dir)


def _write(d, name, lines):
    with open(os.path.join(d, name), "w") as f:
        f.write("".join(ln + "\n" for ln in lines))


def _good_dir(tmp_path, with_wav=True):
    d = str(tmp_path)
    _write(d, "utt2spk", ["spk1-a spk1", "spk1-b spk1", "spk2-a spk2"])
    _write(d, "spk2utt", ["spk1 spk1-a spk1-b", "spk2 spk2-a"])
    if with_wav:
        _write(d, "wav.scp", ["spk1-a /x/a.wav", "spk1-b /x/b.wav",
                              "spk2-a /x/c.wav"])
    return d


def test_valid_dir_passes(tmp_path):
    d = _good_dir(tmp_path)
    _write(d, "utt2num_frames", ["spk1-a 100", "spk1-b 200", "spk2-a 300"])
    _write(d, "utt2dur", ["spk1-a 1.0", "spk1-b 2.0", "spk2-a 3.0"])
    counts = validate_data_dir(d, no_text=True, no_feats=True)
    assert counts["utt2spk"] == 3 and counts["spk2utt"] == 2
    assert main(["--no-text", "--no-feats", d]) == 0


def test_unsorted_utt2spk_fails(tmp_path):
    d = str(tmp_path)
    _write(d, "utt2spk", ["spk2-a spk2", "spk1-a spk1"])
    _write(d, "wav.scp", ["spk1-a /x", "spk2-a /x"])
    with pytest.raises(ValidationError, match="sorted"):
        validate_data_dir(d, no_text=True, no_feats=True)


def test_duplicate_key_fails(tmp_path):
    d = str(tmp_path)
    _write(d, "utt2spk", ["spk1-a spk1", "spk1-a spk1"])
    _write(d, "wav.scp", ["spk1-a /x"])
    with pytest.raises(ValidationError, match="duplicate"):
        validate_data_dir(d, no_text=True, no_feats=True)


def test_speaker_interleaving_fails(tmp_path):
    """Sorted utterance ids but non-contiguous speakers violate Kaldi's
    sorted-first-on-speaker-id rule."""
    d = str(tmp_path)
    _write(d, "utt2spk", ["utt-a spk1", "utt-b spk2", "utt-c spk1"])
    _write(d, "wav.scp", ["utt-a /x", "utt-b /x", "utt-c /x"])
    with pytest.raises(ValidationError, match="contiguous"):
        validate_data_dir(d, no_text=True, no_feats=True)


def test_spk2utt_mismatch_fails(tmp_path):
    d = _good_dir(tmp_path)
    _write(d, "spk2utt", ["spk1 spk1-a", "spk2 spk2-a"])  # missing spk1-b
    with pytest.raises(ValidationError, match="inverse"):
        validate_data_dir(d, no_text=True, no_feats=True)


def test_wav_scp_key_mismatch_fails(tmp_path):
    d = _good_dir(tmp_path)
    _write(d, "wav.scp", ["spk1-a /x", "spk1-b /x"])  # missing spk2-a
    with pytest.raises(ValidationError, match="wav.scp"):
        validate_data_dir(d, no_text=True, no_feats=True)


def test_missing_feats_only_fails_when_required(tmp_path):
    d = _good_dir(tmp_path)
    validate_data_dir(d, no_text=True, no_feats=True)
    with pytest.raises(ValidationError, match="feats.scp"):
        validate_data_dir(d, no_text=True, no_feats=False)
    _write(d, "feats.scp", ["spk1-a /f:1", "spk1-b /f:2", "spk2-a /f:3"])
    validate_data_dir(d, no_text=True, no_feats=False)


def test_bad_utt2num_frames_fails(tmp_path):
    d = _good_dir(tmp_path)
    _write(d, "utt2num_frames", ["spk1-a 100", "spk1-b 0", "spk2-a 300"])
    with pytest.raises(ValidationError, match="utt2num_frames"):
        validate_data_dir(d, no_text=True, no_feats=True)


def test_segments_recording_keyed_wav(tmp_path):
    d = str(tmp_path)
    _write(d, "utt2spk", ["spk1-a spk1", "spk1-b spk1"])
    _write(d, "segments", ["spk1-a reco1 0.0 1.5", "spk1-b reco1 1.5 3.0"])
    _write(d, "wav.scp", ["reco1 /x/r.wav"])
    counts = validate_data_dir(d, no_text=True, no_feats=True)
    assert counts["segments"] == 2 and counts["wav.scp"] == 1
    # a segment referencing an absent recording fails
    _write(d, "segments", ["spk1-a reco1 0.0 1.5", "spk1-b reco9 1.5 3.0"])
    with pytest.raises(ValidationError, match="recordings"):
        validate_data_dir(d, no_text=True, no_feats=True)
    # bad times fail
    _write(d, "segments", ["spk1-a reco1 2.0 1.5", "spk1-b reco1 1.5 3.0"])
    with pytest.raises(ValidationError, match="bad times"):
        validate_data_dir(d, no_text=True, no_feats=True)
