import jax.numpy as jnp
import numpy as np

from slam_toolkit_tpu.loop import vocab as V
from slam_toolkit_tpu.loop.detector import ConsistencyTracker


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def test_train_and_transform_consistency():
    rng = np.random.default_rng(0)
    corpus = rand_desc(rng, 2000)
    voc = V.train(corpus, k=4, levels=3, seed=1)
    assert voc.num_words > 10
    # runtime (device) transform matches the training-time (numpy) one
    sample = jnp.asarray(corpus[:64])
    words_dev = np.asarray(V.descriptor_words(voc, sample,
                                              jnp.ones(64, bool)))
    words_np = V._transform_words_np(
        corpus[:64], np.asarray(voc.nodes), np.asarray(voc.children),
        np.asarray(voc.word_id), voc.k, voc.levels)
    np.testing.assert_array_equal(words_dev, words_np)
    assert (words_dev >= 0).all()


def test_bow_vector_and_scoring():
    rng = np.random.default_rng(1)
    corpus = rand_desc(rng, 1500)
    voc = V.train(corpus, k=4, levels=3, seed=2)
    d1 = jnp.asarray(rand_desc(rng, 128))
    d2 = jnp.asarray(rand_desc(rng, 128))
    valid = jnp.ones(128, bool)
    b1 = V.bow_vector(voc, d1, valid)
    b2 = V.bow_vector(voc, d2, valid)
    # L1-normalized
    np.testing.assert_allclose(float(jnp.abs(b1).sum()), 1.0, atol=1e-5)
    # self-similarity is 1, distinct frames score lower
    db = jnp.stack([b1, b2])
    s = np.asarray(V.l1_score(b1, db))
    assert abs(s[0] - 1.0) < 1e-5
    assert s[1] < s[0]
    # near-duplicate frame scores higher than a random one
    d1_mod = d1.at[:8].set(rand_desc(rng, 8))
    b1m = V.bow_vector(voc, d1_mod, valid)
    s2 = np.asarray(V.l1_score(b1m, db))
    assert s2[0] > s2[1]


def test_invalid_descriptors_ignored():
    rng = np.random.default_rng(2)
    voc = V.train(rand_desc(rng, 800), k=4, levels=2, seed=0)
    d = jnp.asarray(rand_desc(rng, 64))
    half = jnp.arange(64) < 32
    b_half = V.bow_vector(voc, d, half)
    b_full = V.bow_vector(voc, d[:32], jnp.ones(32, bool))
    np.testing.assert_allclose(np.asarray(b_half), np.asarray(b_full),
                               atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    voc = V.train(rand_desc(rng, 500), k=3, levels=2, seed=0)
    p = str(tmp_path / "voc.npz")
    V.save(voc, p)
    voc2 = V.load(p)
    d = jnp.asarray(rand_desc(rng, 32))
    w1 = np.asarray(V.descriptor_words(voc, d, jnp.ones(32, bool)))
    w2 = np.asarray(V.descriptor_words(voc2, d, jnp.ones(32, bool)))
    np.testing.assert_array_equal(w1, w2)


def test_consistency_tracker():
    t = ConsistencyTracker(threshold=3)
    g = {1, 2, 3}
    assert t.update([g]) == []          # streak 0
    assert t.update([{2, 9}]) == []     # streak 1 (intersects)
    assert t.update([{9, 10}]) == []    # streak 2
    assert t.update([{10}]) == [0]      # streak 3 -> accepted
    t.reset()
    assert t.update([{1}]) == []
    assert t.update([{5}]) == []        # disjoint: streak resets to 0


def test_dbow2_text_roundtrip(tmp_path):
    """save_dbow2_text -> load_dbow2_text preserves word assignments
    (up to a word-id permutation) and tree shape."""
    import numpy as np
    import jax.numpy as jnp
    from slam_toolkit_tpu.loop import vocab as V

    rng = np.random.default_rng(3)
    corpus = rng.integers(0, 2**32, (400, 8), dtype=np.uint32)
    voc = V.train(corpus, k=4, levels=3, seed=1)
    p = str(tmp_path / "voc.txt")
    V.save_dbow2_text(voc, p)
    voc2 = V.load_dbow2_text(p)
    assert voc2.k == voc.k and voc2.levels == voc.levels
    assert voc2.num_words == voc.num_words

    q = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
    ok = jnp.ones(64, bool)
    w1 = np.asarray(V.descriptor_words(voc, q, ok))
    w2 = np.asarray(V.descriptor_words(voc2, q, ok))
    # same partition: descriptors sharing a word before share one after
    import collections
    m = {}
    for a, b in zip(w1, w2):
        assert m.setdefault(a, b) == b
    assert len(set(m.values())) == len(m)
