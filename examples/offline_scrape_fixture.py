"""Offline "Giphy" fixture: run the REAL scraper against an in-process fake
of the search API + CDN.

The reference's pipeline starts at data_collection/giphy_scrape.py hitting
api.giphy.com; this environment has zero egress, so the REPRODUCE recipe
(docs/REPRODUCE.md stage 1) drives the actual Scraper code path — worker
threads, media-id dedup, the keywords.txt not-tried marker protocol,
per-keyword dirs — with a fetch_fn that synthesizes the search JSON and
serves deterministic synthetic face videos as the "CDN". Everything
downstream (track, sample-frames, training) then consumes a corpus that
arrived through the same door a real scrape would use.

Usage:
  python examples/offline_scrape_fixture.py --out-dir /tmp/repro/raw \
      [--keywords keywords.txt] [--max-keywords 2] [--per-page 12] \
      [--threads 1] [--size 128] [--length 24]
Prints one JSON stats line (same shape as `gifgan_tpu scrape`). Note the
scraper paginates in 100s (reference giphy_scrape.py semantics), so
items_per_thread stays at 100 and the corpus size is controlled by how
many items the fixture "API" puts on the single result page (--per-page)
times keywords.
"""

import argparse
import hashlib
import json
import os
import sys
import tempfile
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gifgan_tpu.data.scrape import (NOT_TRIED_MARKER, Scraper,  # noqa: E402
                                    media_id, parse_keywords)
from gifgan_tpu.data.synthetic import synthetic_clip  # noqa: E402
from gifgan_tpu.data.video import encode_mp4  # noqa: E402


def make_fixture_fetch(size: int, length: int, per_page: int = 8,
                       pages_with_results: int = 1):
    """fetch_fn(url) -> bytes serving both endpoints the scraper hits."""

    def fetch(url: str) -> bytes:
        u = urlparse(url)
        if u.netloc == "api.giphy.com":
            q = parse_qs(u.query)
            query = q.get("q", ["x"])[0]
            offset = int(q.get("offset", ["0"])[0])
            if offset >= per_page * pages_with_results:
                return b"{}"  # exhausted: no mp4 urls -> workers stop
            items = []
            for i in range(per_page):
                vid = f"{query}{offset + i:05d}"
                items.append(
                    f'{{"mp4":"https://media.giphy.com/media/{vid}/'
                    f'giphy.mp4"}}')
            return ("{" + f'"data":[{",".join(items)}]' + "}").encode()
        vid = media_id(url)
        if vid is None:
            raise ValueError(f"unexpected fixture url: {url}")
        # deterministic per-id synthetic face video
        seed = int.from_bytes(hashlib.sha1(vid.encode()).digest()[:4], "big")
        clip = synthetic_clip(seed, length=length, size=size)
        with tempfile.NamedTemporaryFile(suffix=".mp4", delete=False) as f:
            path = f.name
        try:
            encode_mp4(path, clip)
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)

    return fetch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--keywords", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "keywords.txt"))
    ap.add_argument("--max-keywords", type=int, default=2)
    ap.add_argument("--per-page", type=int, default=12,
                    help="items the fixture API returns per search page")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--length", type=int, default=24)
    args = ap.parse_args()

    with open(args.keywords) as f:
        keywords = parse_keywords(f.read())[:args.max_keywords]
    if not keywords:
        raise SystemExit(f"no keywords after {NOT_TRIED_MARKER!r}")

    fetch = make_fixture_fetch(args.size, args.length,
                               per_page=args.per_page)
    s = Scraper(args.out_dir, fetch, num_threads=args.threads,
                items_per_thread=100)
    stats = s.scrape(keywords)
    print(json.dumps({"new_total": stats.new_total,
                      "per_keyword": stats.per_keyword,
                      "errors": stats.errors,
                      "keywords": keywords,
                      "fixture": {"size": args.size,
                                  "length": args.length}}))


if __name__ == "__main__":
    main()
