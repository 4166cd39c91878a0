from pathlib import Path

import numpy as np
import pytest

from deeprecsys_tpu import zoo
from deeprecsys_tpu.data import RecDataGenerator
from deeprecsys_tpu.data import trace as trace_mod


def test_random_indices_unique_sorted_in_range():
    cfg = zoo.get_config("rm1", table_scale=1000)  # L=80, tables of 4000
    gen = RecDataGenerator(cfg, seed=0)
    batch = gen.generate_batch(16)
    idx = batch.indices
    assert idx.shape == (16, 8, 80)
    assert idx.dtype == np.int32
    for t, n in enumerate(cfg.scaled_rows):
        assert idx[:, t, :].min() >= 0
        assert idx[:, t, :].max() < n
    # Unique + sorted within each pooling group (reference np.unique semantics).
    d = np.diff(idx, axis=2)
    assert (d > 0).all()


def test_dense_features_only_for_dense_models():
    dense_cfg = zoo.get_config("rm1", table_scale=1000)
    assert RecDataGenerator(dense_cfg, 0).generate_batch(2).dense.shape == (2, 128)
    for name in ("ncf", "din", "dien"):
        cfg = zoo.get_config(name, table_scale=1000)
        assert RecDataGenerator(cfg, 0).generate_batch(2).dense is None


def test_small_table_fallback():
    cfg = zoo.get_config("rm2", table_scale=10000)  # 50-row tables, L=120 > size
    with pytest.raises(ValueError):
        RecDataGenerator(cfg, 0).generate_batch(2)
    cfg2 = zoo.get_config("rm2", table_scale=2000)  # 250-row tables, L=120: dense fallback
    batch = RecDataGenerator(cfg2, 0).generate_batch(4)
    d = np.diff(batch.indices, axis=2)
    assert (d > 0).all()


def test_targets():
    cfg = zoo.get_config("rm1", table_scale=1000)
    gen = RecDataGenerator(cfg, seed=0)
    t = gen.generate_targets(8)
    assert t.shape == (8, 1)
    assert ((t >= 0) & (t < 1)).all()
    tr = gen.generate_targets(8, round_targets=True)
    assert set(np.unique(tr)) <= {0.0, 1.0}


def test_generator_reproducible():
    cfg = zoo.get_config("ncf", table_scale=100)
    a = RecDataGenerator(cfg, seed=5).generate_batch(4)
    b = RecDataGenerator(cfg, seed=5).generate_batch(4)
    np.testing.assert_array_equal(a.indices, b.indices)
    c = RecDataGenerator(cfg, seed=6).generate_batch(4)
    assert not np.array_equal(a.indices, c.indices)


# ----------------------------------------------------------------------
# Stack-distance trace model (data_generator/trace_*.py parity)
# ----------------------------------------------------------------------


def test_trace_profile_simple():
    # a b a c b: distances 0,0,2,0,3 ; uniques a,b,c
    lines, sds = trace_mod.trace_profile([1, 2, 1, 3, 2])
    assert lines == [1, 2, 3]
    assert sds == [0, 0, 2, 0, 3]


def test_trace_roundtrip_through_file(tmp_path):
    line_accesses, vals, cdf = trace_mod.synthesize_zipf_distribution(200, num_samples=2000)
    p = tmp_path / "dist.txt"
    trace_mod.write_dist_file(p, line_accesses, vals, cdf)
    la, sd, cs = trace_mod.read_dist_from_file(p)
    assert la == [int(x) for x in line_accesses]
    assert sd == [int(v) for v in vals]
    assert len(cs) == len(cdf)
    refs = trace_mod.trace_generate_lru(la, sd, cs, 50, rng=np.random.default_rng(0))
    assert len(refs) == 50
    assert all(r in set(la) | set(refs) for r in refs)


def test_synthetic_generation_mode(tmp_path):
    cfg = zoo.get_config("ncf", table_scale=100)
    line_accesses, vals, cdf = trace_mod.synthesize_zipf_distribution(64, num_samples=4000)
    p = tmp_path / "dist.txt"
    trace_mod.write_dist_file(p, line_accesses, vals, cdf)
    gen = RecDataGenerator(cfg, seed=0, data_generation="synthetic", trace_file=str(p))
    batch = gen.generate_batch(4)
    assert batch.indices.shape == (4, 4, 1)
    for t, n in enumerate(cfg.scaled_rows):
        assert batch.indices[:, t, :].max() < n
        assert batch.indices[:, t, :].min() >= 0


def test_trace_cli_roundtrip(tmp_path):
    """Offline trace tooling CLI (trace_profile.py / trace_generator.py
    analog): profile -> generate -> re-profile round-trips."""
    from deeprecsys_tpu.data.trace import main, read_dist_from_file

    dist = tmp_path / "dist.txt"
    trace = tmp_path / "trace.txt"
    main(["profile", "--zipf-lines", "200", "--samples", "20000",
          "--out", str(dist)])
    la, sd, cdf = read_dist_from_file(dist)
    assert len(la) == 200 and abs(cdf[-1] - 1.0) < 1e-9

    main(["generate", "--dist-file", str(dist), "--length", "4000",
          "--out", str(trace)])
    ids = [int(x) for x in trace.read_text().split()]
    assert len(ids) == 4000
    assert set(ids) <= set(la)  # only profiled lines appear

    dist2 = tmp_path / "dist2.txt"
    main(["profile", "--trace-file", str(trace), "--out", str(dist2)])
    la2, _, cdf2 = read_dist_from_file(dist2)
    assert set(la2) <= set(la) and abs(cdf2[-1] - 1.0) < 1e-9


REF_DATAGEN = Path("/root/reference/data_generator")


@pytest.mark.skipif(not REF_DATAGEN.exists(), reason="reference assets absent")
def test_reference_shipped_sd_cumm_generates(tmp_path):
    """The reference's checked-in 2-line profile/sd_cumm
    (trace_generator.py:33-45 format) must load and drive generation
    verbatim — a migrating user's first command works unmodified."""
    la, sd, cdf = trace_mod.read_dist_from_file(REF_DATAGEN / "profile" / "sd_cumm")
    assert la is None and len(sd) == len(cdf) == 941
    assert sd[0] == 0 and all(a < b for a, b in zip(sd, sd[1:]))
    assert abs(cdf[-1] - 1.0) < 1e-6

    out = tmp_path / "trace.txt"
    trace_mod.main(["generate", "--dist-file",
                    str(REF_DATAGEN / "profile" / "sd_cumm"),
                    "--length", "2560", "--table-size", "1000000",
                    "--out", str(out)])
    ids = trace_mod.read_trace_file(out)
    assert len(ids) == 2560
    assert 0 <= ids.min() and ids.max() < 1_000_000
    # temporal locality materializes: far fewer uniques than references
    assert len(set(ids.tolist())) < 2560


@pytest.mark.skipif(not REF_DATAGEN.exists(), reason="reference assets absent")
def test_reference_shipped_tbl1_profiles(tmp_path):
    """The reference's shipped raw trace syn_traces/tbl1 (single-line,
    comma-separated, trace_generator.py:100-108) must profile through the
    CLI into BOTH output formats, and the 2-line output must itself feed
    generation (the reference's own profile->generate pipeline)."""
    tbl1 = REF_DATAGEN / "syn_traces" / "tbl1"
    ids = trace_mod.read_trace_file(tbl1)
    assert len(ids) == 2560  # 1 batch x 32 mini-batch x 80 pooling

    cumm = tmp_path / "sd_cumm"
    prob = tmp_path / "sd_prob"
    trace_mod.main(["profile", "--trace-file", str(tbl1), "--format", "2line",
                    "--out", str(cumm), "--out-prob", str(prob)])
    la, sd, cdf = trace_mod.read_dist_from_file(cumm)
    assert la is None and abs(cdf[-1] - 1.0) < 1e-9
    _, sd_p, pdf = trace_mod.read_dist_from_file(prob)
    assert sd_p == sd
    np.testing.assert_allclose(np.cumsum(pdf), cdf, atol=1e-9)

    out = tmp_path / "regen.txt"
    trace_mod.main(["generate", "--dist-file", str(cumm), "--length", "512",
                    "--table-size", "4096", "--out", str(out)])
    regen = trace_mod.read_trace_file(out)
    assert len(regen) == 512 and regen.max() < 4096


@pytest.mark.skipif(not REF_DATAGEN.exists(), reason="reference assets absent")
def test_generator_synthetic_mode_accepts_2line_trace_file():
    """--data_generation synthetic --trace_file <shipped sd_cumm> works
    end-to-end: the generator bootstraps per-table line accesses from the
    table's own row count (trace_generator.py:70 analog)."""
    cfg = zoo.get_config("ncf", table_scale=100)
    gen = RecDataGenerator(cfg, seed=0, data_generation="synthetic",
                           trace_file=str(REF_DATAGEN / "profile" / "sd_cumm"))
    batch = gen.generate_batch(4)
    assert batch.indices.shape == (4, 4, 1)
    for t, n in enumerate(cfg.scaled_rows):
        assert batch.indices[:, t, :].max() < n
        assert batch.indices[:, t, :].min() >= 0


def test_synthetic_mode_deterministic_and_stateful(tmp_path):
    """Same seed -> identical streams; the per-table LRU line state
    persists across batches (continuing the trace, not resetting it)."""
    from deeprecsys_tpu import zoo
    from deeprecsys_tpu.data import RecDataGenerator
    from deeprecsys_tpu.data.trace import synthesize_zipf_distribution, write_dist_file

    cfg = zoo.get_config("rm1", table_scale=2000)
    dist = tmp_path / "d.txt"
    la, sd, cdf = synthesize_zipf_distribution(min(cfg.scaled_rows), num_samples=20000)
    write_dist_file(dist, la, sd, cdf)

    g1 = RecDataGenerator(cfg, seed=7, data_generation="synthetic", trace_file=str(dist))
    g2 = RecDataGenerator(cfg, seed=7, data_generation="synthetic", trace_file=str(dist))
    a1, a2 = g1.generate_batch(8), g2.generate_batch(8)
    np.testing.assert_array_equal(a1.indices, a2.indices)
    b1 = g1.generate_batch(8)
    assert not np.array_equal(a1.indices, b1.indices)  # stream advanced
    # State continuity: second batch from a fresh generator differs from
    # the continuing stream's second batch only if state persisted; verify
    # via equality with an identically-seeded continuing twin instead.
    b2 = g2.generate_batch(8)
    np.testing.assert_array_equal(b1.indices, b2.indices)


def test_synthetic_trace_degenerate_raises(tmp_path):
    """A trace whose distinct residues can never reach L must fail loudly
    (at engine warm-up) instead of spinning forever in the top-up loop."""
    import pytest

    from deeprecsys_tpu import zoo
    from deeprecsys_tpu.data import RecDataGenerator
    from deeprecsys_tpu.data.trace import write_dist_file

    cfg = zoo.get_config("rm1", table_scale=2000,
                         num_indices_per_lookup=4)
    p = tmp_path / "one_line.txt"
    write_dist_file(p, [7], [0], [1.0])  # a single distinct line
    gen = RecDataGenerator(cfg, seed=0, data_generation="synthetic",
                           trace_file=str(p))
    with pytest.raises(ValueError, match="distinct ids"):
        gen.generate_batch(2)


def test_dataset_mode_streams_criteo(tmp_path):
    """data_generation='dataset' (reference --data_set/--raw_data_file,
    dlrm_data_caffe2.py:36-37): Criteo TSV streamed into the fused layout,
    real labels via generate_targets, cycling at EOF."""
    from deeprecsys_tpu.data.criteo import criteo_model_config, write_synthetic_criteo

    path = tmp_path / "criteo.tsv"
    write_synthetic_criteo(path, 300, seed=3)
    cfg = criteo_model_config(rows_per_table=1000)
    gen = RecDataGenerator(cfg, data_generation="dataset", raw_data_file=str(path))
    b1 = gen.generate_batch(128)
    t1 = gen.generate_targets(128)
    assert b1.indices.shape == (128, 26, 1) and b1.dense.shape == (128, 13)
    assert b1.indices.min() >= 0 and b1.indices.max() < 1000
    assert set(np.unique(t1)) <= {0.0, 1.0}  # real click labels
    b2 = gen.generate_batch(128)
    b3 = gen.generate_batch(128)  # 300 rows / 128 = 2 full batches, then cycle
    assert not np.array_equal(b1.indices, b2.indices)
    assert np.array_equal(b1.indices, b3.indices)


def test_dataset_mode_errors(tmp_path):
    from deeprecsys_tpu.data.criteo import criteo_model_config, write_synthetic_criteo

    cfg = criteo_model_config(rows_per_table=1000)
    with pytest.raises(ValueError, match="raw_data_file"):
        RecDataGenerator(cfg, data_generation="dataset")
    path = tmp_path / "tiny.tsv"
    write_synthetic_criteo(path, 5, seed=0)
    gen = RecDataGenerator(cfg, data_generation="dataset", raw_data_file=str(path))
    with pytest.raises(ValueError, match="fewer than"):
        gen.generate_batch(64)
    # dataset targets follow generate_batch
    gen2 = RecDataGenerator(cfg, data_generation="dataset", raw_data_file=str(path))
    with pytest.raises(ValueError, match="generate_batch"):
        gen2.generate_targets(4)
    # config must match the Criteo column layout
    with pytest.raises(ValueError, match="26 tables"):
        RecDataGenerator(zoo.get_config("rm1", table_scale=1000),
                         data_generation="dataset", raw_data_file=str(path))
