"""materialized_cache discipline: fingerprint reuse, stale invalidation,
atomic install (the stale-fixture hazard the _SUCCESS-only checks had)."""

import json
import os

from gordo_components_spark.caches import materialized_cache


def _builds(counter):
    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "payload.txt"), "w") as fh:
            fh.write(f"build-{counter['n']}")
        counter["n"] += 1

    return build


def test_cache_hits_on_same_fingerprint(tmp_path, sf_dir):
    counter = {"n": 0}
    root = str(tmp_path / "scratch")
    out1 = materialized_cache(sf_dir, root, "leg", "events", _builds(counter))
    out2 = materialized_cache(sf_dir, root, "leg", "events", _builds(counter))
    assert out1 == out2
    assert counter["n"] == 1  # second call served the fingerprinted dir
    assert os.path.isfile(os.path.join(out1, "payload.txt"))


def test_cache_rebuilds_on_stale_fingerprint(tmp_path, sf_dir):
    counter = {"n": 0}
    root = str(tmp_path / "scratch")
    out = materialized_cache(sf_dir, root, "leg", "events", _builds(counter))
    # simulate a regenerated fixture: same path, different row count
    marker = os.path.join(out, "_FP.json")
    with open(marker) as fh:
        fp = json.load(fh)
    fp["n_rows"] += 1
    with open(marker, "w") as fh:
        json.dump(fp, fh)
    materialized_cache(sf_dir, root, "leg", "events", _builds(counter))
    assert counter["n"] == 2  # stale fingerprint forced a rebuild
    with open(marker) as fh:
        assert json.load(fh)["n_rows"] == fp["n_rows"] - 1  # fresh marker


def test_cache_rebuilds_on_missing_marker(tmp_path, sf_dir):
    counter = {"n": 0}
    root = str(tmp_path / "scratch")
    out = materialized_cache(sf_dir, root, "leg", "events", _builds(counter))
    os.remove(os.path.join(out, "_FP.json"))  # e.g. a killed half-write
    materialized_cache(sf_dir, root, "leg", "events", _builds(counter))
    assert counter["n"] == 2
