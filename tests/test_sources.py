"""Source readers: JSON records (S13), pagemeta tile flattening (S12)."""

import json


def test_read_json_records(ray_session, tmp_path):
    from siren_ray.sources.readers import read_json_records

    path = tmp_path / "data.json"
    records = [{"url": f"u{i}", "title": f"t{i}"} for i in range(5)]
    path.write_text(json.dumps(records))
    ds = read_json_records(str(path))
    df = ds.to_pandas()
    assert len(df) == 5 and set(df.columns) == {"url", "title"}


def test_flatten_pagemeta():
    from siren_ray.sources.readers import (
        flatten_pagemeta,
        make_pagemeta_fixture,
    )

    raw = make_pagemeta_fixture(n_pages=3, tiles_per_level=4)
    t = flatten_pagemeta(raw)  # level2 only, like the reference (ocr.py:81)
    assert t.num_rows == 3 * 4
    assert set(t["level"].to_pylist()) == {"level2"}
    assert t["tx"].to_pylist()[:4] == [0, 512, 1024, 1536]

    t_all = flatten_pagemeta(raw, levels=("thumbs", "level2"))
    assert t_all.num_rows == 3 * 4 * 2


def test_registry_lookup():
    from siren_ray.sources.registry import PIPELINES, get_pipeline

    assert get_pipeline("online.indiatoday.IndiaTodayOnlineScraper") is not None
    assert get_pipeline("nope") is None
    assert len(PIPELINES) >= 7


def test_config_date_defaults():
    from datetime import datetime, timedelta

    from siren_ray.config import RunConfig

    c = RunConfig(scraper="x", start=datetime(2024, 1, 10), days=3)
    assert c.end == datetime(2024, 1, 13)  # only start -> start+days
    c2 = RunConfig(scraper="x", end=datetime(2024, 1, 10), days=3)
    assert c2.start == datetime(2024, 1, 7)  # only end -> end-days
    c3 = RunConfig(scraper="x", days=2)
    assert (c3.end - c3.start) == timedelta(days=2)
