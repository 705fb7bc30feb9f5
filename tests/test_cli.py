"""CLI lifecycle test (SURVEY.md §3.1/§3.2): config -> registry -> run ->
projected CSV under the W4 naming scheme."""

import csv
import os


def test_cli_single_scraper(ray_session, corpus_sf0001, tmp_path):
    from siren_ray.__main__ import main

    rc = main([
        "--scraper", "online.indiatoday.IndiaTodayOnlineScraper",
        "--keywords", "suicide",
        "--start", "2024-02-01", "--end", "2024-05-01",
        "--out", str(tmp_path),
        "--sf", "0.001",
    ])
    assert rc == 0
    # W6: outputs route into a per-origin folder (cloud.py:70-78 analog)
    assert os.listdir(tmp_path) == ["IndiaTodayOnlineScraper"]
    origin_dir = os.path.join(tmp_path, "IndiaTodayOnlineScraper")
    dirs = os.listdir(origin_dir)
    assert any("IndiaTodayOnlineScraper_2024-02-01_2024-05-01" in d
               for d in dirs)
    outdir = os.path.join(origin_dir, dirs[0])
    rows = []
    for f in sorted(os.listdir(outdir)):
        with open(os.path.join(outdir, f)) as fh:
            rows.extend(list(csv.DictReader(fh)))
    assert rows and "url" in rows[0]


def test_cli_unknown_scraper(ray_session, tmp_path):
    from siren_ray.__main__ import main

    rc = main(["--scraper", "does.not.Exist", "--out", str(tmp_path),
               "--sf", "0.001"])
    assert rc == 1  # reference prints "Could not find scraper" (__main__.py:157)


def test_cli_toml_config(ray_session, corpus_sf0001, tmp_path):
    from siren_ray.__main__ import main

    cfgfile = tmp_path / "config.toml"
    cfgfile.write_text(
        'scraper = "epaper.ht.HTScraper"\n'
        'keywords = ["suicide", "found dead"]\n'
        'ignore_keywords = ["suicide bomb"]\n'
        'start = "2024-02-01"\n'
        'end = "2024-05-01"\n'
        'max_concurrency = 50\n'
        f'corpus_dir = "{corpus_sf0001}"\n'
        f'out = "{tmp_path}"\n'
    )
    rc = main(["--config", str(cfgfile), "--out", str(tmp_path),
               "--sf", "0.001"])
    assert rc == 0
    assert any("HTScraper" in d for d in os.listdir(tmp_path))


def test_cli_routes_through_cloud_backend(ray_session, corpus_sf0001,
                                          tmp_path):
    """W6 delivery goes through the CloudBackend protocol: every CSV
    part is uploaded via backend.upload into the origin's folder (the
    Drive seam; reference cloud.py:30-78), not written ad hoc."""
    from siren_ray.__main__ import main
    from siren_ray.sources.cloud import CloudBackend, LocalFolderBackend

    backend = LocalFolderBackend(str(tmp_path))
    assert isinstance(backend, CloudBackend)  # protocol conformance
    rc = main([
        "--scraper", "online.indiatoday.IndiaTodayOnlineScraper",
        "--keywords", "suicide",
        "--start", "2024-02-01", "--end", "2024-05-01",
        "--out", str(tmp_path),
        "--sf", "0.001",
    ], backend=backend)
    assert rc == 0
    assert backend.uploads  # delivery happened through the protocol
    dests = [d for _, d in backend.uploads]
    assert all(f"{tmp_path}/IndiaTodayOnlineScraper/" in d for d in dests)
    rows = []
    for d in dests:
        with open(d) as fh:
            rows.extend(list(csv.DictReader(fh)))
    assert rows and "url" in rows[0]


def test_clean_hook_applies_before_projection(ray_session, tmp_path):
    """The clean() post-hook (reference scraper.py:141-142, identity by
    default): a registered non-identity hook transforms pipeline rows
    before projection/serialization."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from siren_ray.__main__ import main
    from siren_ray.sources.cloud import LocalFolderBackend
    from siren_ray.sources.registry import CLEAN_HOOKS, register_clean_hook

    def upcase(t: pa.Table) -> pa.Table:
        return t.set_column(t.schema.get_field_index("data"), "data",
                            pc.utf8_upper(t["data"]))

    register_clean_hook("dummy.DummyScraper", upcase)
    try:
        backend = LocalFolderBackend(str(tmp_path))
        rc = main(["--scraper", "dummy.DummyScraper",
                   "--out", str(tmp_path), "--sf", "0.001"], backend=backend)
        assert rc == 0
        rows = []
        for _, d in backend.uploads:
            with open(d) as fh:
                rows.extend(list(csv.DictReader(fh)))
        assert {r["data"] for r in rows} == {"DUMMY SAMPLE A",
                                             "DUMMY SAMPLE B"}
    finally:
        CLEAN_HOOKS.pop("dummy.DummyScraper", None)


def test_cli_crawl_job(ray_session, corpus_sf0001, tmp_path, capsys):
    """`python -m siren_ray crawl` — the ray-job-submit unit: runs the
    frontier engine against a corpus, writes resumable outputs, prints
    ONE JSON summary line with per-stage wall metrics, and a --resume
    re-submission continues instead of restarting."""
    import json

    from siren_ray.__main__ import main

    out = str(tmp_path / "crawl")
    rc = main(["crawl", "--corpus", corpus_sf0001, "--out", out,
               "--max-rounds", "2"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["rounds"] == 2 and rep["fetched"] > 0
    assert set(rep["stage_wall_s"]) == {"t_sched", "t_fetch", "io_s",
                                        "t_frontier"}
    assert os.path.isdir(os.path.join(out, "extracted"))
    # resume: continues from checkpoint (more rounds, monotone fetched)
    rc = main(["crawl", "--corpus", corpus_sf0001, "--out", out,
               "--max-rounds", "4", "--resume"])
    assert rc == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["rounds"] == 4 and rep2["seen"] >= rep["seen"]
