"""Corpus driver tests: batched == solo bytes, resume, quarantine
(SURVEY.md §5.3–§5.5; BASELINE config 4)."""

import json
import os

import numpy as np
import pytest

from tac import api
from tac.config import PRESETS
from tac.corpus import CorpusTranscoder
from tac.io.wav import write_wav

CFG = PRESETS["corpus"].replace(sample_rate=16000, n_channels=1,
                                n_mdct_lines=256, bitrate_bps=64000)


@pytest.fixture()
def corpus_dir(tmp_path):
    fs = 16000
    rng = np.random.default_rng(5)
    paths = []
    for i, t_len in enumerate((4000, 7000, 12000, 12500)):
        t = np.arange(t_len) / fs
        x = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t) \
            + 0.01 * rng.standard_normal(t_len)
        p = tmp_path / f"clip{i}.wav"
        write_wav(str(p), x, fs)
        paths.append(str(p))
    return tmp_path, paths


def test_default_batch_size_derived(corpus_dir):
    """batch_size=None derives the per-backend default (VERDICT r3 item 3:
    the measured lane-batch knee on healthy TPU attach, 8 on link-bound/
    CPU backends) and still yields per-clip byte-identical streams — the
    lane-batched scan starts every clip's reservoir chain at 0, so batch
    membership can never change bytes."""
    from tac import tuning

    tmp_path, paths = corpus_dir
    out = tmp_path / "out_default"
    tc = CorpusTranscoder(CFG, str(out))          # batch_size=None
    assert tc.batch_size == tuning.corpus_batch_default() >= 1
    stats = tc.run(paths, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 0
    for p in paths[:2]:
        from tac.io.wav import read_wav
        x, fs = read_wav(p)
        name = os.path.splitext(os.path.basename(p))[0] + ".pac"
        assert (out / name).read_bytes() == api.encode_array(x, CFG), p


def test_batched_bytes_equal_solo(corpus_dir):
    tmp_path, paths = corpus_dir
    out = tmp_path / "out"
    tc = CorpusTranscoder(CFG, str(out), batch_size=4)
    stats = tc.run(paths, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 0
    for p in paths:
        from tac.io.wav import read_wav
        x, fs = read_wav(p)
        solo = api.encode_array(x, CFG)
        name = os.path.splitext(os.path.basename(p))[0] + ".pac"
        batched = (out / name).read_bytes()
        assert batched == solo, p


@pytest.mark.parametrize("kw", [
    dict(use_huffman=True),
    dict(use_block_switch=True, n_mdct_lines_short=64),
    dict(use_huffman=True, use_block_switch=True, n_mdct_lines_short=64),
], ids=["vbr", "bs", "combo"])
def test_batched_bytes_equal_solo_all_families(corpus_dir, kw):
    """Corpus encode must route every stream family through its own packed
    encoder (r2 regression: VBR/bs configs silently took the raw-layout
    packer, emitting mis-labeled streams)."""
    tmp_path, paths = corpus_dir
    cfg = CFG.replace(**kw)
    out = tmp_path / ("out_" + "_".join(sorted(kw)))
    tc = CorpusTranscoder(cfg, str(out), batch_size=4)
    stats = tc.run(paths, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 0
    for p in paths:
        from tac.io.wav import read_wav
        x, fs = read_wav(p)
        solo = api.encode_array(x, cfg)
        name = os.path.splitext(os.path.basename(p))[0] + ".pac"
        assert (out / name).read_bytes() == solo, p


def test_resume_skips_done(corpus_dir):
    tmp_path, paths = corpus_dir
    out = tmp_path / "out2"
    tc = CorpusTranscoder(CFG, str(out), batch_size=2)
    tc.run(paths[:2], log=lambda *a: None)
    stats = tc.run(paths, log=lambda *a: None)      # resume over full list
    assert stats["ok"] == 4
    lines = [json.loads(l) for l in
             open(out / "manifest.jsonl").read().splitlines()]
    assert sum(1 for r in lines if r["status"] == "ok") == 4  # no re-encode


def test_bad_clip_quarantined(corpus_dir, tmp_path):
    _, paths = corpus_dir
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    out = tmp_path / "out3"
    tc = CorpusTranscoder(CFG, str(out), batch_size=4)
    stats = tc.run([str(bad)] + paths[:1], log=lambda *a: None)
    assert stats["ok"] == 1 and stats["failed"] == 1
    recs = {json.loads(l)["clip"]: json.loads(l)["status"]
            for l in open(out / "manifest.jsonl").read().splitlines()}
    assert recs[str(bad)] == "read_error"


def test_mesh_corpus_bytes_equal_solo(corpus_dir):
    """Sharded (8-device clips mesh) corpus bytes == solo encodes."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tac import parallel
    tmp_path, paths = corpus_dir
    out = tmp_path / "out_mesh"
    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    tc = CorpusTranscoder(CFG, str(out), batch_size=4, mesh=mesh)
    stats = tc.run(paths, log=lambda *a: None)
    assert stats["ok"] == 4
    from tac.io.wav import read_wav
    for p in paths:
        x, fs = read_wav(p)
        name = os.path.splitext(os.path.basename(p))[0] + ".pac"
        assert (out / name).read_bytes() == api.encode_array(x, CFG), p


def test_decoded_output_valid(corpus_dir):
    tmp_path, paths = corpus_dir
    out = tmp_path / "out4"
    CorpusTranscoder(CFG, str(out), batch_size=4).run(
        paths, log=lambda *a: None)
    from tac.io.wav import read_wav
    x, fs = read_wav(paths[0])
    y, fs2 = api.decode_array((out / "clip0.pac").read_bytes())
    assert fs2 == CFG.sample_rate and y.shape[0] == x.shape[0]


def _encode_corpus(tmp_path, paths, cfg=CFG, sub="enc"):
    out = tmp_path / sub
    CorpusTranscoder(cfg, str(out), batch_size=4).run(
        paths, log=lambda *a: None)
    return [str(out / (os.path.splitext(os.path.basename(p))[0] + ".pac"))
            for p in paths]


def test_corpus_decode_matches_solo(corpus_dir):
    """Batched corpus decode PCM == per-stream api.decode_array to within
    one 16-bit LSB (zero-padded rows decode to silence past the true frame
    count; the padded graph shape shifts float ulps at rounding edges)."""
    from tac.corpus import CorpusDecoder
    tmp_path, paths = corpus_dir
    pacs = _encode_corpus(tmp_path, paths)
    out = tmp_path / "dec"
    stats = CorpusDecoder(str(out), batch_size=4).run(
        pacs, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 0
    from tac.io.wav import read_wav
    for p in pacs:
        y_solo, fs = api.decode_array(open(p, "rb").read(),
                                      precision="fast")
        name = os.path.splitext(os.path.basename(p))[0] + ".wav"
        y_corp, fs2 = read_wav(str(out / name))
        assert fs2 == fs
        # both sides round-trip through 16-bit WAV quantization
        ref = np.clip(np.round(y_solo * 32768.0), -32768, 32767) / 32768.0
        # padded-batch graph vs solo graph: float ulps at rounding
        # boundaries land within one 16-bit LSB
        np.testing.assert_allclose(y_corp, ref, atol=1.001 / 32768.0)


def test_corpus_decode_resume_and_quarantine(corpus_dir, tmp_path):
    from tac.corpus import CorpusDecoder
    tp, paths = corpus_dir
    pacs = _encode_corpus(tp, paths)
    bad = tmp_path / "bad.pac"
    bad.write_bytes(b"\x00" * 16)
    out = tp / "dec2"
    dec = CorpusDecoder(str(out), batch_size=2)
    dec.run(pacs[:2], log=lambda *a: None)
    stats = dec.run([str(bad)] + pacs, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 1
    recs = {json.loads(l)["clip"]: json.loads(l)["status"]
            for l in open(out / "decode_manifest.jsonl").read().splitlines()}
    assert recs[str(bad)] in ("corrupt", "read_error")


def test_corpus_decode_mixed_families(corpus_dir):
    """One run over streams from different configs groups and decodes all."""
    from tac.corpus import CorpusDecoder
    tmp_path, paths = corpus_dir
    pacs_raw = _encode_corpus(tmp_path, paths[:2], CFG, "enc_raw")
    pacs_vbr = _encode_corpus(tmp_path, paths[2:],
                              CFG.replace(use_huffman=True), "enc_vbr")
    out = tmp_path / "dec3"
    stats = CorpusDecoder(str(out), batch_size=4).run(
        pacs_raw + pacs_vbr, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 0
    from tac.io.wav import read_wav
    for p in pacs_raw + pacs_vbr:
        y_solo, _ = api.decode_array(open(p, "rb").read(), precision="fast")
        name = os.path.splitext(os.path.basename(p))[0] + ".wav"
        y_corp, _ = read_wav(str(out / name))
        ref = np.clip(np.round(y_solo * 32768.0), -32768, 32767) / 32768.0
        np.testing.assert_allclose(y_corp, ref, atol=1.001 / 32768.0)


def test_mesh_corpus_decode_matches_solo(corpus_dir):
    """Mesh-sharded corpus decode == per-stream decode (8-device clips
    axis, device-side int16 PCM)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tac import parallel
    from tac.corpus import CorpusDecoder
    tmp_path, paths = corpus_dir
    pacs = _encode_corpus(tmp_path, paths, CFG, "enc_mesh")
    mesh = parallel.make_mesh(n_clips=8, n_frames=1)
    out = tmp_path / "dec_mesh"
    stats = CorpusDecoder(str(out), batch_size=4, mesh=mesh).run(
        pacs, log=lambda *a: None)
    assert stats["ok"] == 4 and stats["failed"] == 0
    from tac.io.wav import read_wav
    for p in pacs:
        y_solo, _ = api.decode_array(open(p, "rb").read(), precision="fast")
        name = os.path.splitext(os.path.basename(p))[0] + ".wav"
        y_corp, _ = read_wav(str(out / name))
        ref = np.clip(np.round(y_solo * 32768.0), -32768, 32767) / 32768.0
        np.testing.assert_allclose(y_corp, ref, atol=1.001 / 32768.0)
