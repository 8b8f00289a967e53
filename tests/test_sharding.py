"""Sharded vs single-device equivalence on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kmer_id_tpu.config import ClassifyConfig  # noqa: E402
from kmer_id_tpu.core.taxonomy import Taxonomy  # noqa: E402
from kmer_id_tpu.engine.classify import Classifier  # noqa: E402
from kmer_id_tpu.engine.pipeline import SampleProcessor  # noqa: E402
from kmer_id_tpu.parallel import ShardedClassifier, make_mesh  # noqa: E402
from tests.test_classify_e2e import make_db, make_reads, rand_dna  # noqa: E402

rng = np.random.default_rng(31)


@pytest.fixture(scope="module")
def world():
    from kmer_id_tpu.db.probes import pack_probes

    rec, kmap = make_db(num_targ=8, probes_per_target=40)
    parent = [1, 1, 1, 2, 2, 4, 1, 6]
    tax = Taxonomy(np.array(parent, dtype=np.int32))
    packed = pack_probes(rec, num_targ=8)
    return rec, kmap, tax, packed


def _run(clf, cfg, records):
    sp = SampleProcessor(clf, cfg)
    sp.feed(records)
    return sp.finish()


@pytest.mark.parametrize("dp,dbp", [(8, 1), (1, 8), (4, 2), (2, 3)])
def test_sharded_matches_single_device(world, dp, dbp):
    rec, kmap, tax, packed = world
    assert len(jax.devices()) >= dp * dbp, "conftest must provide 8 cpu devices"
    records = make_reads(kmap, n=200, read_len=80)
    # add some long reads to cover the chunked path under sharding
    for i in range(3):
        parts = []
        for _ in range(5):
            parts.append(rand_dna(150))
            import kmer_id_tpu.core.codec as codec

            parts.append(codec.key_to_string(list(kmap)[i * 7]))
        records.append((f"L{i}", "".join(parts), None))

    cfg = ClassifyConfig.preset("nx", num_targ=8, batch_size=16, max_len=96)
    single = Classifier(packed, tax, batch_size=16, max_len=96)
    res1 = _run(single, cfg, records)

    mesh = make_mesh(data=dp, db=dbp)
    shard = ShardedClassifier(packed, tax, mesh, batch_size=16, max_len=96)
    res2 = _run(shard, cfg, records)

    assert res1.gcount.tolist() == res2.gcount.tolist()
    assert res1.ucount.tolist() == res2.ucount.tolist()
    assert res1.reads == res2.reads


@pytest.mark.parametrize("dp,dbp", [(8, 1), (1, 8), (4, 2), (2, 4)])
def test_fp_sharded_matches_single_device(world, dp, dbp):
    """The production fingerprint engine sharded over a (data, db) mesh is
    bit-equal to the single-device fingerprint engine (and hence to the
    reference): L1 bucket-range sharding + all_gather hit merge."""
    from kmer_id_tpu.engine.fpclassify import FpClassifier
    from kmer_id_tpu.parallel.fpsharded import ShardedFpClassifier

    rec, kmap, tax, packed = world
    assert len(jax.devices()) >= dp * dbp
    records = make_reads(kmap, n=200, read_len=80)
    for i in range(3):
        parts = []
        for _ in range(5):
            parts.append(rand_dna(150))
            import kmer_id_tpu.core.codec as codec

            parts.append(codec.key_to_string(list(kmap)[i * 7]))
        records.append((f"L{i}", "".join(parts), None))

    cfg = ClassifyConfig.preset("nx", num_targ=8, batch_size=16, max_len=96)
    single = FpClassifier(packed, tax, batch_size=16, max_len=96)
    res1 = _run(single, cfg, records)

    mesh = make_mesh(data=dp, db=dbp)
    shard = ShardedFpClassifier(packed, tax, mesh, batch_size=16, max_len=96)
    res2 = _run(shard, cfg, records)

    assert res1.gcount.tolist() == res2.gcount.tolist()
    assert res1.ucount.tolist() == res2.ucount.tolist()
    assert res1.reads == res2.reads


def test_fp_sharded_overflow_replay(world):
    """Hit-dense reads exceed max_hits and exercise the sharded
    target-plane replay."""
    from kmer_id_tpu.engine.fpclassify import FpClassifier
    from kmer_id_tpu.parallel.fpsharded import ShardedFpClassifier
    import kmer_id_tpu.core.codec as codec

    rec, kmap, tax, packed = world
    keys = list(kmap)
    records = []
    for i in range(6):
        seq = "".join(
            codec.key_to_string(keys[int(rng.integers(len(keys)))]) for _ in range(12)
        )
        records.append((f"h{i}", seq, None))
    cfg = ClassifyConfig.preset("nx", num_targ=8, batch_size=8, max_len=512)
    single = FpClassifier(packed, tax, batch_size=8, max_len=512, max_hits=8)
    res1 = _run(single, cfg, records)
    mesh = make_mesh(data=2, db=4)
    shard = ShardedFpClassifier(packed, tax, mesh, batch_size=8, max_len=512, max_hits=8)
    res2 = _run(shard, cfg, records)
    assert res1.gcount.tolist() == res2.gcount.tolist()
    assert res1.ucount.tolist() == res2.ucount.tolist()


def test_fp_sharded_long_many_aggregated(world):
    """process_long_many packs chunks of MANY long reads into shared mesh
    planes; finals and counters must match the single-device engine."""
    from kmer_id_tpu.engine.fpclassify import FpClassifier
    from kmer_id_tpu.io.batch import LongRead
    from kmer_id_tpu.parallel.fpsharded import ShardedFpClassifier
    import kmer_id_tpu.core.codec as codec

    rec, kmap, tax, packed = world
    keys = list(kmap)
    items = []
    for i in range(5):
        parts = []
        for j in range(4):
            parts.append(rand_dna(120))
            parts.append(codec.key_to_string(keys[(i * 11 + j * 3) % len(keys)]))
        seq = "".join(parts)
        items.append(LongRead(meta=f"L{i}", codes=codec.encode_bases(seq)))

    single = FpClassifier(packed, tax, batch_size=8, max_len=96)
    s1 = single.new_seen()
    s1, f1 = single.process_long_many(s1, items)

    mesh = make_mesh(data=2, db=4)
    shard = ShardedFpClassifier(packed, tax, mesh, batch_size=8, max_len=96)
    s2 = shard.new_seen()
    s2, f2 = shard.process_long_many(s2, items)

    assert [int(x) for x in f1] == [int(x) for x in f2]
    assert single.ucount(s1).tolist() == shard.ucount(s2).tolist()
