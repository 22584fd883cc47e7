"""tfks-make-voxceleb: native local/make_voxceleb{1,2}.pl equivalents
(/root/reference/egs/voxceleb/v1/run.sh:45-53 — the perl builders are
symlinked from Kaldi at stage -1 and are not in the reference tree)."""

import os

from tf_kaldi_speaker_tpu.cli.make_voxceleb import main


def _touch(*parts):
    path = os.path.join(*parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"\x00")
    return path


def _read_map(path):
    out = {}
    with open(path) as f:
        for line in f:
            k, v = line.rstrip("\n").split(" ", 1)
            out[k] = v
    return out


def _build_vox1_tree(wav_root):
    # 4 speakers x 2 videos x 2 clips
    for s in range(1, 5):
        for v in ("vidA", "vidB"):
            for c in ("00001", "00002"):
                _touch(wav_root, "id%05d" % s, v, c + ".wav")


def test_voxceleb1_consolidated_layout(tmp_path):
    root = str(tmp_path / "vox1")
    _build_vox1_tree(os.path.join(root, "wav"))
    trials = str(tmp_path / "veri_test.txt")
    with open(trials, "w") as f:
        # target + nontarget pairs among id00003/id00004, plus one pair
        # referencing a clip absent from the tree (must be dropped)
        f.write("1 id00003/vidA/00001.wav id00003/vidB/00002.wav\n")
        f.write("0 id00003/vidA/00001.wav id00004/vidA/00001.wav\n")
        f.write("1 id00004/vidB/00001.wav id00004/vidB/99999.wav\n")
    out = str(tmp_path / "data")
    assert main(["voxceleb1", root, out, "--trials", trials]) == 0

    train = _read_map(os.path.join(out, "voxceleb1_train", "utt2spk"))
    test = _read_map(os.path.join(out, "voxceleb1_test", "utt2spk"))
    # split is by trial-list speakers, not by corpus partition
    assert set(train.values()) == {"id00001", "id00002"}
    assert set(test.values()) == {"id00003", "id00004"}
    assert len(train) == 8 and len(test) == 8
    # utt ids sort after their speaker prefix (validate_data_dir contract)
    assert list(train) == sorted(train)
    assert all(u.startswith(s + "-") for u, s in train.items())

    scp = _read_map(os.path.join(out, "voxceleb1_train", "wav.scp"))
    assert all(os.path.isfile(p) for p in scp.values())

    s2u = _read_map(os.path.join(out, "voxceleb1_train", "spk2utt"))
    assert sorted(s2u) == ["id00001", "id00002"]
    assert len(s2u["id00001"].split()) == 4

    with open(os.path.join(out, "voxceleb1_test", "trials")) as f:
        lines = [ln.split() for ln in f]
    # the pair naming the absent clip is dropped
    assert lines == [
        ["id00003-vidA-00001", "id00003-vidB-00002", "target"],
        ["id00003-vidA-00001", "id00004-vidA-00001", "nontarget"],
    ]


def test_voxceleb1_split_layout(tmp_path):
    """Original dev/test split downloads: $root/{dev,test}/wav/..."""
    root = str(tmp_path / "vox1")
    _touch(root, "dev", "wav", "id00001", "vidA", "00001.wav")
    _touch(root, "test", "wav", "id00002", "vidA", "00001.wav")
    trials = str(tmp_path / "veri_test.txt")
    with open(trials, "w") as f:
        f.write("0 id00002/vidA/00001.wav id00002/vidA/00001.wav\n")
    out = str(tmp_path / "data")
    assert main(["voxceleb1", root, out, "--trials", trials]) == 0
    train = _read_map(os.path.join(out, "voxceleb1_train", "utt2spk"))
    test = _read_map(os.path.join(out, "voxceleb1_test", "utt2spk"))
    assert set(train.values()) == {"id00001"}
    assert set(test.values()) == {"id00002"}


def test_voxceleb2_aac_layout_emits_ffmpeg_pipes(tmp_path):
    root = str(tmp_path / "vox2")
    for s in (101, 102):
        _touch(root, "dev", "aac", "id%05d" % s, "clipX", "00001.m4a")
    out = str(tmp_path / "data")
    assert main(["voxceleb2", root, out, "--part", "dev"]) == 0
    scp = _read_map(os.path.join(out, "voxceleb2_dev", "wav.scp"))
    assert sorted(scp) == ["id00101-clipX-00001", "id00102-clipX-00001"]
    for entry in scp.values():
        # Kaldi-style command rxfilename, same decode pipe
        # make_voxceleb2.pl emits
        assert entry.startswith("ffmpeg ") and entry.endswith("- |")
        assert ".m4a" in entry


def test_voxceleb2_wav_layout_direct_paths(tmp_path):
    root = str(tmp_path / "vox2")
    _touch(root, "test", "wav", "id00201", "clipY", "00001.wav")
    out = str(tmp_path / "data")
    assert main(["voxceleb2", root, out, "--part", "test"]) == 0
    scp = _read_map(os.path.join(out, "voxceleb2_test", "wav.scp"))
    assert list(scp.values())[0].endswith(".wav")
