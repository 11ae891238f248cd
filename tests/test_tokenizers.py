"""Golden-value tests for the DNA k-mer tokenizer and label strings.

Golden values derived from the reference semantics
(bioscanclip/model/dna_encoder.py:25-35, util/util.py:48-69): torchtext vocab
with specials first (MASK=0, CLS=1, UNK=2) then 4^5 5-mers lexicographically.
"""

import numpy as np

from bioscan_clip_tpu.data import tokenizers as T


def test_vocab_layout():
    v = T.kmer_vocab()
    assert v["<MASK>"] == 0 and v["<CLS>"] == 1 and v["<UNK>"] == 2
    assert v["AAAAA"] == 3
    assert v["AAAAC"] == 4
    assert v["AAAAG"] == 5
    assert v["AAAAT"] == 6
    assert v["AAACA"] == 7
    assert v["TTTTT"] == 3 + 4**5 - 1 == 1026
    assert len(v) == T.VOCAB_SIZE == 1027


def test_tokenize_shape_and_prepend():
    toks = T.tokenize_dna("ACGT" * 200)  # 800 chars -> truncated to 660
    assert toks.shape == (133,)
    assert toks[0] == 0  # literal prepended token (dna_encoder.py:33)


def test_tokenize_known_values():
    # 660 x 'A' -> all kmers AAAAA = id 3
    toks = T.tokenize_dna("A" * 660)
    assert (toks[1:] == 3).all()
    # First kmer ACGTA: codes 0,1,2,3,0 -> 0*256+1*64+2*16+3*4+0 = 108 -> +3 = 111
    toks = T.tokenize_dna("ACGTA" + "A" * 655)
    assert toks[1] == 111
    assert (toks[2:] == 3).all()


def test_padding_with_N_gives_unk():
    # Short sequence: remainder padded with N -> those kmers are <UNK>=2
    toks = T.tokenize_dna("A" * 10)  # 2 valid kmers, 130 all-N
    assert (toks[1:3] == 3).all()
    assert (toks[3:] == 2).all()


def test_mixed_invalid_kmer():
    # A kmer straddling valid+N is UNK
    toks = T.tokenize_dna("A" * 7)  # kmer0 = AAAAA, kmer1 = AANNN -> UNK
    assert toks[1] == 3 and toks[2] == 2


def test_batch_matches_single():
    seqs = ["ACGT" * 165, "A" * 660, "T" * 100, ""]
    batch = T.tokenize_dna_batch(seqs)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(batch[i], T.tokenize_dna(s))


def test_reference_pipeline_crosscheck():
    """Re-implement the reference pipeline naively (pure python) and compare."""
    from itertools import product

    vocab = {"<MASK>": 0, "<CLS>": 1, "<UNK>": 2}
    for i, km in enumerate(product("ACGT", repeat=5)):
        vocab["".join(km)] = 3 + i

    def ref_pipeline(x):
        # PadSequence(660)
        x = x[:660] if len(x) > 660 else x + "N" * (660 - len(x))
        toks = [x[i : i + 5] for i in range(0, len(x) - 5 + 1, 5)]
        return [0] + [vocab.get(t, 2) for t in toks]

    rng = np.random.default_rng(0)
    alphabet = np.array(list("ACGTN-"))
    for _ in range(20):
        n = int(rng.integers(0, 800))
        seq = "".join(rng.choice(alphabet, size=n))
        np.testing.assert_array_equal(T.tokenize_dna(seq), np.array(ref_pipeline(seq)))


def test_label_strings():
    out = T.build_label_strings(
        [b"Diptera"], ["Sciaridae"], [b"Corynoptera"], ["Corynoptera sp."]
    )
    assert out == ["Diptera Sciaridae Corynoptera Corynoptera sp."]
