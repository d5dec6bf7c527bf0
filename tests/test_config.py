"""Config system: defaults + YAML/JSON override with recursive merge,
mirroring the reference's semantics (Ocr/src/config.py:13-97 — override
wins, nested dicts merge, scalars/lists replace, bad/missing files fall back
to defaults), plus the --config wiring of jobs/extract_job.py and the
per-stage debug sample sink (cli/debug_output.py analog)."""

import copy
import json

import pytest

from documentprocessor_spark.config import (
    DEFAULT_CONFIG,
    load_config,
    merge_configs,
    save_config,
)


# ---------------------------------------------------------------------------
# merge semantics (reference _merge_configs, config.py:81-97)
# ---------------------------------------------------------------------------


def test_merge_nested_override_keeps_siblings():
    merged = merge_configs(DEFAULT_CONFIG, {"job": {"buckets": 8}})
    assert merged["job"]["buckets"] == 8
    assert merged["job"]["format"] == "parquet"  # sibling untouched
    assert merged["extraction"] == DEFAULT_CONFIG["extraction"]


def test_merge_scalar_replaces_dict_and_dict_replaces_scalar():
    # reference semantics: only dict-over-dict recurses; any other pairing
    # replaces wholesale
    m1 = merge_configs({"a": {"x": 1}}, {"a": 5})
    assert m1["a"] == 5
    m2 = merge_configs({"a": 5}, {"a": {"x": 1}})
    assert m2["a"] == {"x": 1}


def test_merge_lists_replace_not_concat():
    m = merge_configs({"a": {"l": [1, 2]}}, {"a": {"l": [3]}})
    assert m["a"]["l"] == [3]


def test_merge_adds_unknown_keys():
    m = merge_configs(DEFAULT_CONFIG, {"custom": {"k": 1}})
    assert m["custom"] == {"k": 1}


def test_merge_does_not_mutate_inputs():
    base = {"a": {"x": 1, "y": 2}}
    snap_base = copy.deepcopy(base)
    override = {"a": {"x": 9}}
    snap_override = copy.deepcopy(override)
    merge_configs(base, override)
    assert base == snap_base and override == snap_override


# ---------------------------------------------------------------------------
# load_config (reference config.py:49-78)
# ---------------------------------------------------------------------------


def test_load_no_path_returns_defaults():
    assert load_config(None) == DEFAULT_CONFIG


def test_load_missing_file_returns_defaults(tmp_path):
    assert load_config(str(tmp_path / "nope.yaml")) == DEFAULT_CONFIG


def test_load_yaml_override(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("job:\n  buckets: 16\n  mode: model\nextraction:\n  entry_c: true\n")
    cfg = load_config(str(p))
    assert cfg["job"]["buckets"] == 16
    assert cfg["job"]["mode"] == "model"
    assert cfg["extraction"]["entry_c"] is True
    assert cfg["extraction"]["min_confidence"] == 0.5  # sibling kept
    assert DEFAULT_CONFIG["job"]["buckets"] == 64  # defaults not mutated


def test_load_json_override(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"job": {"buckets": 4, "debug_samples": 3}}))
    cfg = load_config(str(p))
    assert cfg["job"]["buckets"] == 4
    assert cfg["job"]["debug_samples"] == 3


def test_load_empty_file_is_noop(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("")
    assert load_config(str(p)) == DEFAULT_CONFIG


def test_load_unparseable_falls_back_to_defaults(tmp_path):
    # reference behavior: log the error, run on defaults — never raise
    p = tmp_path / "c.yaml"
    p.write_text("{:::: not yaml ::::")
    assert load_config(str(p)) == DEFAULT_CONFIG


def test_load_non_mapping_root_falls_back(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("- just\n- a\n- list\n")
    assert load_config(str(p)) == DEFAULT_CONFIG


def test_save_load_roundtrip(tmp_path):
    cfg = load_config(None)
    cfg["job"]["buckets"] = 7
    y = tmp_path / "out.yaml"
    save_config(cfg, str(y))
    assert load_config(str(y)) == cfg
    j = tmp_path / "out.json"
    save_config(cfg, str(j))
    assert load_config(str(j)) == cfg


# ---------------------------------------------------------------------------
# --config wiring: config drives the job, explicit CLI flags override it
# ---------------------------------------------------------------------------


@pytest.fixture()
def pages_parquet(spark, tmp_path):
    from documentprocessor_spark.sources.synthetic import distributed_corpus

    path = str(tmp_path / "pages")
    distributed_corpus(spark, 40).write.parquet(path)
    return path


def _run_job_cli(spark, argv):
    from jobs.extract_job import main

    main(argv, stop_session=False)


def test_extract_job_reads_config(spark, pages_parquet, tmp_path, capsys):
    cfgp = tmp_path / "job.yaml"
    cfgp.write_text("job:\n  buckets: 4\n  stats: true\n")
    out = str(tmp_path / "out")
    _run_job_cli(spark, [
        "--input", pages_parquet, "--output", out, "--config", str(cfgp),
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_total_committed"] == 40
    res = spark.read.parquet(out + "/results")
    n_buckets = res.select("url_bucket").distinct().count()
    assert n_buckets <= 4  # bucketed by the config value, not the default 64


def test_extract_job_cli_flag_overrides_config(spark, pages_parquet, tmp_path, capsys):
    cfgp = tmp_path / "job.yaml"
    cfgp.write_text("job:\n  buckets: 4\n")
    out = str(tmp_path / "out")
    _run_job_cli(spark, [
        "--input", pages_parquet, "--output", out,
        "--config", str(cfgp), "--buckets", "2", "--stats",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_total_committed"] == 40
    res = spark.read.parquet(out + "/results")
    assert res.select("url_bucket").distinct().count() <= 2


def test_extract_job_config_entry_c_matches_direct_kernel(
    spark, pages_parquet, tmp_path, capsys
):
    from documentprocessor_spark.plans.pipeline import extract_from_pages

    cfgp = tmp_path / "job.yaml"
    cfgp.write_text("extraction:\n  entry_c: true\n")
    out = str(tmp_path / "out")
    _run_job_cli(spark, [
        "--input", pages_parquet, "--output", out, "--config", str(cfgp),
    ])
    got = spark.read.parquet(out + "/results")
    pages = spark.read.parquet(pages_parquet)
    want = extract_from_pages(pages, entry_c=True)
    cols = ["url", "extracted_text", "status"]
    assert sorted(got.select(*cols).collect()) == sorted(want.select(*cols).collect())


# ---------------------------------------------------------------------------
# debug sample sink (reference cli/debug_output.py analog)
# ---------------------------------------------------------------------------


def test_debug_samples_written_and_match_pipeline(spark, pages_parquet, tmp_path):
    from documentprocessor_spark.plans.pipeline import run_job

    out = str(tmp_path / "out")
    stats = run_job(
        spark,
        spark.read.parquet(pages_parquet),
        out,
        n_buckets=4,
        debug_samples=5,
        collect_stats=False,
    )
    base = f"{out}/debug/run_id={stats['run_id']}"
    stage_urls = {}
    for stage in ("pages", "words", "normalized", "fields"):
        df = spark.read.parquet(f"{base}/{stage}")
        rows = df.select("url").collect()
        assert len(rows) == 5, stage
        stage_urls[stage] = sorted(r.url for r in rows)
    # per-url lineage: all four stage tables sample the SAME documents
    assert len(set(map(tuple, stage_urls.values()))) == 1
    # stage content is the real pipeline's: fields sample == main results
    fields = spark.read.parquet(f"{base}/fields").select("url", "extracted_text")
    main_res = spark.read.parquet(out + "/results").select("url", "extracted_text")
    sample_vs_main = fields.alias("s").join(
        main_res.alias("m"), "url"
    ).filter("s.extracted_text <> m.extracted_text")
    assert sample_vs_main.count() == 0
    # normalized boxes are within the 0-1000 scale
    norm = spark.read.parquet(f"{base}/normalized")
    bad = norm.selectExpr(
        "size(filter(words, w -> w.x1 > 1000 or w.y1 > 1000 or w.x0 < 0)) as n"
    ).filter("n > 0")
    assert bad.count() == 0


def test_debug_samples_off_writes_nothing(spark, pages_parquet, tmp_path):
    import os

    from documentprocessor_spark.plans.pipeline import run_job

    out = str(tmp_path / "out")
    run_job(
        spark, spark.read.parquet(pages_parquet), out,
        n_buckets=4, collect_stats=False,
    )
    assert not os.path.exists(f"{out}/debug")
