"""Native C++ packer/loader vs NumPy reference (reference analog: the
input pipelines driving the reference's examples — torch DataLoader +
Megatron indexed datasets)."""
import os

import numpy as np
import pytest

from transformerengine_tpu.data import (
    PackedDataLoader, native_available, pack_sequences, read_token_bin,
    write_token_bin)


def _docs(rng, n=20, lo=3, hi=60):
    return [rng.integers(1, 1000, size=rng.integers(lo, hi)).astype(np.int32)
            for _ in range(n)]


@pytest.fixture
def bin_file(tmp_path):
    rng = np.random.default_rng(0)
    docs = _docs(rng)
    path = str(tmp_path / "toks.bin")
    write_token_bin(path, docs)
    return path, docs


def test_roundtrip_bin(bin_file):
    path, docs = bin_file
    flat, offsets = read_token_bin(path)
    assert len(offsets) == len(docs) + 1
    for i, d in enumerate(docs):
        np.testing.assert_array_equal(flat[offsets[i]:offsets[i + 1]], d)


class TestPacking:
    def _check_valid(self, docs, tok, seg, pos, max_len, pad_id=0):
        # Every document chunk appears exactly once, contiguously, with
        # positions restarting per segment; pads have segment 0.
        seen = []
        for r in range(len(tok)):
            sids = sorted(set(seg[r]) - {0})
            for sid in sids:
                m = seg[r] == sid
                idx = np.where(m)[0]
                assert np.array_equal(idx, np.arange(idx[0], idx[-1] + 1)), \
                    "segment not contiguous"
                np.testing.assert_array_equal(pos[r][m], np.arange(m.sum()))
                seen.append(tok[r][m].tobytes())
            assert np.all(tok[r][seg[r] == 0] == pad_id)
        # reconstruct all chunks from the docs
        expect = []
        for d in docs:
            for c in range(0, len(d), max_len):
                expect.append(np.asarray(d[c:c + max_len], np.int32).tobytes())
        assert sorted(seen) == sorted(expect)

    def test_numpy_packing_valid(self, bin_file):
        path, docs = bin_file
        flat, offsets = read_token_bin(path)
        tok, seg, pos = pack_sequences(flat, offsets, 64, use_native=False)
        self._check_valid(docs, tok, seg, pos, 64)

    def test_native_matches_numpy(self, bin_file):
        if not native_available():
            pytest.skip("no g++ / native build failed")
        path, docs = bin_file
        flat, offsets = read_token_bin(path)
        ref = pack_sequences(flat, offsets, 64, use_native=False)
        got = pack_sequences(flat, offsets, 64, use_native=True)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)

    def test_long_docs_split(self):
        docs = [np.arange(1, 150, dtype=np.int32)]
        path_flat = np.concatenate(docs)
        tok, seg, pos = pack_sequences(
            path_flat, np.array([0, 149], np.int64), 64, use_native=False)
        self._check_valid(docs, tok, seg, pos, 64)

    def test_density(self, bin_file):
        """FFD must waste less than one row's worth of slack per row on
        this distribution (sanity check that packing actually packs)."""
        path, docs = bin_file
        flat, offsets = read_token_bin(path)
        tok, seg, pos = pack_sequences(flat, offsets, 64, use_native=False)
        fill = (seg != 0).mean()
        assert fill > 0.7, f"packing too sparse: {fill:.2f}"


class TestLoader:
    @pytest.mark.parametrize("use_native", [False, True])
    def test_batches_shape_and_content(self, bin_file, use_native):
        if use_native and not native_available():
            pytest.skip("no native lib")
        path, docs = bin_file
        dl = PackedDataLoader(path, batch_rows=2, seq_len=64,
                              use_native=use_native, n_threads=2, seed=7)
        assert dl.native == use_native
        vocab = {int(t) for d in docs for t in d}
        for _ in range(10):
            tok, seg, pos = dl.next_batch()
            assert tok.shape == (2, 64) and seg.shape == (2, 64)
            valid = seg != 0
            assert valid.any()
            assert set(np.unique(tok[valid])).issubset(vocab)
            # positions restart per segment
            for r in range(2):
                for sid in set(seg[r]) - {0}:
                    m = seg[r] == sid
                    np.testing.assert_array_equal(
                        pos[r][m], np.arange(m.sum()))
        dl.close()

    def test_feeds_sequence_descriptor(self, bin_file):
        """Packed output drives the attention stack's packed-batch path."""
        import jax.numpy as jnp
        from transformerengine_tpu.attention import (
            AttnBackend, AttnMaskType, SequenceDescriptor, fused_attn)
        import jax
        path, _ = bin_file
        dl = PackedDataLoader(path, batch_rows=2, seq_len=64,
                              use_native=False)
        tok, seg, pos = dl.next_batch()
        desc = SequenceDescriptor.from_segment_ids_and_pos(jnp.asarray(seg))
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 2, 32))
        out = fused_attn((q, q, q), sequence_descriptor=desc,
                         attn_mask_type=AttnMaskType.PADDING_CAUSAL,
                         backend=AttnBackend.UNFUSED)
        assert bool(jnp.isfinite(out).all())
