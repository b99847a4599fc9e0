import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_topw_matches_dense_scores():
    """Sparse top-w scoring equals dense L1 when w >= distinct words,
    and lower-bounds it when truncated (SURVEY §7.3 top-w design;
    ref DBoW2/ScoringObject.cpp:34-60 sparse intersection)."""
    rng = np.random.default_rng(4)
    voc = V.train(rand_desc(rng, 1500), k=4, levels=3, seed=2)
    valid = jnp.ones(128, bool)
    frames = [jnp.asarray(rand_desc(rng, 128)) for _ in range(6)]
    dense_q = [V.bow_vector(voc, d, valid) for d in frames]
    dense_db = jnp.stack(dense_q)
    # w = 128 >= distinct words per 128-descriptor frame: exact
    sq = [V.bow_topw(voc, d, valid, 128) for d in frames]
    db = V.TopWBow(words=jnp.stack([s.words for s in sq]),
                   weights=jnp.stack([s.weights for s in sq]))
    for i in range(6):
        s_dense = np.asarray(V.l1_score(dense_q[i], dense_db))
        s_sparse = np.asarray(V.topw_l1_score(sq[i], db))
        np.testing.assert_allclose(s_sparse, s_dense, atol=1e-5)
    # truncated width: a LOWER BOUND that keeps self-similarity on top
    sq16 = [V.bow_topw(voc, d, valid, 16) for d in frames]
    db16 = V.TopWBow(words=jnp.stack([s.words for s in sq16]),
                     weights=jnp.stack([s.weights for s in sq16]))
    s16 = np.asarray(V.topw_l1_score(sq16[0], db16))
    s_dense0 = np.asarray(V.l1_score(dense_q[0], dense_db))
    assert (s16 <= s_dense0 + 1e-5).all()
    assert s16.argmax() == 0


def test_topw_db_helpers_dispatch():
    """make_bow_db / db_set / bow_score round-trip in both backends."""
    rng = np.random.default_rng(5)
    voc = V.train(rand_desc(rng, 600), k=4, levels=2, seed=0)
    d = jnp.asarray(rand_desc(rng, 64))
    ok = jnp.ones(64, bool)
    for sparse in (False, True):
        db = V.make_bow_db(voc, 8, sparse, top_w=64)
        q = V.bow_query(voc, d, ok, sparse, top_w=64)
        db = V.db_set(db, jnp.int32(3), q)
        s = np.asarray(V.bow_score(q, db))
        assert s.shape == (8,)
        assert abs(s[3] - 1.0) < 1e-5, s
        # unregistered sparse rows must score 0 (pure padding)
        if sparse:
            assert (np.delete(s, 3) < 1e-6).all(), s


def _synthetic_big_vocab(k: int, levels: int, seed: int) -> "V.Vocabulary":
    """Directly construct a full k-ary tree vocabulary (no training):
    the ORBvoc-scale runtime test needs the SHAPE (>=1e5 words), not a
    meaningful clustering."""
    rng = np.random.default_rng(seed)
    counts = [k ** l for l in range(levels + 1)]
    n = sum(counts)
    nodes = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
    children = np.full((n, k), 0, np.int64)
    level_start = np.cumsum([0] + counts)
    for lvl in range(levels):
        s, e = level_start[lvl], level_start[lvl + 1]
        for i in range(s, e):
            base = level_start[lvl + 1] + (i - s) * k
            children[i] = np.arange(base, base + k)
    leaves = np.arange(level_start[levels], n)
    word_id = np.full(n, -1, np.int64)
    word_id[leaves] = np.arange(leaves.size)
    for i in leaves:
        children[i] = i                      # self-padding at leaves
    weights = rng.uniform(0.5, 2.0, leaves.size).astype(np.float32)
    return V.Vocabulary(nodes=jnp.asarray(nodes),
                        children=jnp.asarray(children, jnp.int32),
                        word_id=jnp.asarray(word_id, jnp.int32),
                        weights=jnp.asarray(weights),
                        k=k, levels=levels)


@pytest.mark.slow
def test_orbvoc_scale_topw_runtime():
    """A k=10, L=5 (100k-word) vocabulary runs the full sparse
    query->register->score path under the production memory budget —
    the regime where the dense (F, W) database is impossible
    (ref ORBvoc is k=10, L=6 ~= 1M words, src/pipeline.cpp:60-67;
    at F=1024 dense f32 would be 4 GB; top-w rows are ~2 MB)."""
    voc = _synthetic_big_vocab(k=10, levels=5, seed=0)
    assert voc.num_words >= 100_000

    rng = np.random.default_rng(6)
    w = 512
    F = 64
    db = V.make_bow_db(voc, F, sparse=True, top_w=w)
    sparse_bytes = db.words.size * 4 + db.weights.size * 4
    dense_bytes = F * voc.num_words * 4
    assert sparse_bytes < dense_bytes / 50, (sparse_bytes, dense_bytes)

    # register frames; frame 40 is a revisit of frame 8 (90% shared
    # descriptors) — it must out-score every unrelated frame
    base = rand_desc(rng, 256)
    queries = []
    for i in range(F):
        d = rand_desc(rng, 256)
        if i == 40:
            d[:230] = base[:230]
        if i == 8:
            d = base
        q = V.bow_query(voc, jnp.asarray(d), jnp.ones(256, bool),
                        sparse=True, top_w=w)
        queries.append(q)
        db = V.db_set(db, jnp.int32(i), q)
    s = np.array(V.bow_score(queries[40], db))
    s[40] = -1.0
    assert s.argmax() == 8, (s.argmax(), s[8], np.sort(s)[-3:])
    assert s[8] > 2 * np.delete(s, [8, 40]).max()


@pytest.mark.slow
def test_orbvoc_full_scale_1m():
    """The reference's ACTUAL startup configuration: k=10, L=6 = 1M
    words / 1,111,111 nodes, loaded at every run (ref
    src/pipeline.cpp:60-67, TemplatedVocabulary.h:1338-1398). Runs the
    full sparse query -> register -> score path at that scale
    (r3 task #5 / r4 verdict #2) and checks the two properties the
    runtime depends on: (a) quantization robustness — a descriptor
    with a few flipped bits usually lands in the same word, (b)
    revisit discrimination through the top-w database."""
    rng = np.random.default_rng(7)
    voc = V.synthesize(k=10, levels=6, seed=0,
                       corpus=rand_desc(rng, 20_000))
    assert voc.num_words == 10 ** 6
    assert voc.nodes.shape[0] == 1_111_111

    import jax
    K, w, F = 256, 500, 24
    q_fn = jax.jit(lambda d: V.bow_query(voc, d, jnp.ones(K, bool),
                                         sparse=True, top_w=w))

    # (a) quantization robustness under small descriptor noise
    d0 = rand_desc(rng, K)
    # flip ~4 random bits per 256-bit descriptor
    keep = rng.random((K, 256)) < (4 / 256.0)
    mask = np.packbits(keep, axis=-1).view(np.uint32)
    d1 = d0 ^ mask
    w0 = np.asarray(V.descriptor_words(voc, jnp.asarray(d0),
                                       jnp.ones(K, bool)))
    w1 = np.asarray(V.descriptor_words(voc, jnp.asarray(d1),
                                       jnp.ones(K, bool)))
    same = float((w0 == w1).mean())
    # per-level argmin-gap flips bound this ~independently of the tree's
    # construction (see synthesize's docstring); what detection needs is
    # the RELATIVE margin asserted in (b), not per-word determinism
    assert same > 0.3, f"word stability {same:.2f} under 4-bit noise"

    # (b) revisit discrimination at F=24 frames: an exact revisit, a
    # 90%-shared revisit, and a NOISY revisit (4 flipped bits on every
    # descriptor — the viewpoint-change regime) must all out-score
    # unrelated frames by a wide margin
    db = V.make_bow_db(voc, F, sparse=True, top_w=w)
    base = rand_desc(rng, K)
    for i in range(F):
        d = rand_desc(rng, K)
        if i == 20:
            d[:int(K * 0.9)] = base[:int(K * 0.9)]
        if i == 4:
            d = base.copy()
        if i == 11:
            d = d1.copy()                   # noisy copy of d0 (below)
        db = V.db_set(db, jnp.int32(i), q_fn(jnp.asarray(d)))
    q = q_fn(jnp.asarray(base))
    s = np.array(V.bow_score(q, db))
    order = np.argsort(-s)
    assert order[0] == 4 and order[1] == 20, (order[:3], s[order[:3]])
    assert s[4] > 0.98                      # exact revisit ~ 1.0
    assert s[20] > 5 * np.delete(s, [4, 11, 20]).max()
    s_noisy = np.array(V.bow_score(q_fn(jnp.asarray(d0)), db))
    unrelated = np.delete(s_noisy, [11]).max()
    assert s_noisy[11] > 10 * unrelated, (s_noisy[11], unrelated)
