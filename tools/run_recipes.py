"""Execute every python snippet in RECIPES.md verbatim, in order, in
one shared session — the doc's truthfulness gate. Exits non-zero on
the first failing snippet.

Run: `PYTHONPATH=. python tools/run_recipes.py`
"""

import re
import shutil
import sys

sys.path.insert(0, ".")


def main() -> int:
    for p in (
        "/tmp/recipe_store",
        "/tmp/recipe_ckpt",
        "/tmp/recipe_shards",
        "/tmp/recipe_mhidx",
        "/tmp/recipe_ivf",
        "/tmp/recipe_tpch",
        "/tmp/recipe_crawl",
        "/tmp/recipe_dsir",
    ):
        shutil.rmtree(p, ignore_errors=True)

    # recipe 4 needs a crawl directory; synthesize a small WARC
    import os

    from graphula_spark.sources.warc import write_warc

    os.makedirs("/tmp/recipe_crawl")
    recs = [
        {
            "warc_type": "response",
            "target_uri": f"https://site{i % 3}.example.org/p/{i}?utm_source=x",
            "warc_date": f"2026-01-0{i % 9 + 1}T00:00:00Z",
            "http_status": 200,
            "content_type": "text/html; charset=utf-8",
            "payload": (
                "<html><body><p>"
                + f"this is the recipe page number {i} and it was written "
                + " ".join(f"with a word{i}_{j} in it" for j in range(20))
                + "</p></body></html>"
            ).encode(),
        }
        for i in range(12)
    ]
    with open("/tmp/recipe_crawl/c.warc", "wb") as fh:
        fh.write(write_warc(recs))

    src = open("RECIPES.md").read()
    snippets = re.findall(r"```python\n(.*?)```", src, re.S)
    assert snippets, "no snippets found"
    env: dict = {}
    for i, snip in enumerate(snippets, 1):
        print(f"--- recipe {i} ---")
        exec(compile(snip, f"<recipe {i}>", "exec"), env)  # noqa: S102
    # spot checks beyond "didn't throw"
    assert env["df"].count() == 5  # recipe 1 LIMIT 5
    assert env["closed"].triples.count() >= env["raw"].triples.count()
    assert env["res"].shards.count() > 0
    assert env["picked"].count() == 100
    assert env["exact"].count() == 50  # 5 queries x k=10
    assert env["rev"].count() == env["rev_fast"].count()
    print("ALL RECIPES OK")
    env["spark"].stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
