"""manage-CLI tests (D1-D3 over store directories, no Spark)."""

import json
import os

from website_indexer_spark.plans import manage


def _mk_store(root, name, status, started):
    d = root / name
    d.mkdir()
    (d / "crawl.json").write_text(
        json.dumps({"crawl_id": name, "status": status, "started": started})
    )


def test_list_delete_clean(tmp_path):
    _mk_store(tmp_path, "c1", "Finished", "2026-01-01T00:00:00Z")
    _mk_store(tmp_path, "c2", "Finished", "2026-02-01T00:00:00Z")
    _mk_store(tmp_path, "c3", "Failed", "2026-02-10T00:00:00Z")
    _mk_store(tmp_path, "c4", "Started", "2026-03-01T00:00:00Z")
    _mk_store(tmp_path, "c5", "Started", "2026-03-02T00:00:00Z")
    (tmp_path / "not_a_store").mkdir()  # ignored: no crawl.json

    listed = [os.path.basename(d) for d, _ in manage.list_crawls(str(tmp_path))]
    assert listed == ["c5", "c4", "c3", "c2", "c1"]

    # dry-run delete keeps the store
    assert manage.delete_crawl(str(tmp_path), "c1", dry_run=True)
    assert (tmp_path / "c1").exists()
    assert not manage.delete_crawl(str(tmp_path), "nope")

    # clean keep=1: non-latest Started (c4) + 2nd-newest Finished (c1)
    gone = manage.clean_crawls(str(tmp_path), keep=1)
    assert sorted(gone) == ["c1", "c4"]
    assert (tmp_path / "c2").exists() and (tmp_path / "c5").exists()
    assert not (tmp_path / "c4").exists()

    # real delete
    assert manage.delete_crawl(str(tmp_path), "c2")
    assert not (tmp_path / "c2").exists()
