"""Run every queries() entry against a schema-correct EMPTY corpus and
report crashes — the empty-partition robustness sweep (the kg_* family
is excluded: the fake-page adapter requires a non-empty documents
table by design).

Usage: python tools/check_empty.py
"""

from __future__ import annotations

import sys
import tempfile


def main():
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data import DataContext

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    sys.path.insert(0, "/root/repo")

    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    d = tempfile.mkdtemp(prefix="empty_sf_")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        s = pq.read_schema(f"{src_dir}/{t}.parquet")
        pq.write_table(s.empty_table(), f"{d}/{t}.parquet")

    import __ray_entry__ as m

    fails = []
    for name, fn in m.queries().items():
        if name.startswith(("kg_", "repo_")):
            continue
        try:
            r = fn(d)
            if isinstance(r, rd.Dataset):
                r.count()
            elif isinstance(r, pa.Table):
                r.num_rows
            else:
                len(r)
            print(f"ok   {name}")
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}")
    print(f"\n{len(fails)} failing on the empty corpus")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
