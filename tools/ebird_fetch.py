#!/usr/bin/env python3
"""Regenerate data/ebird_species.json from the eBird API.

Offline scraper equivalent to the reference's ebirdspecies.py contract:
for each NZ subnational1 region, fetch the region info (bounds) and the
species list, and store them keyed by region code. Needs network access and
an EBIRD_API_KEY environment variable.

Usage: python tools/ebird_fetch.py [--out data/ebird_species.json]
"""

import argparse
import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone
from pathlib import Path

API = "https://api.ebird.org/v2"


def _get(path, key):
    req = urllib.request.Request(f"{API}{path}", headers={"X-eBirdApiToken": key})
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=str(
            Path(__file__).resolve().parent.parent
            / "audio_analysis_tpu/data/ebird_species.json"
        ),
    )
    ap.add_argument("--country", default="NZ")
    args = ap.parse_args()

    key = os.environ.get("EBIRD_API_KEY")
    if not key:
        sys.exit("set EBIRD_API_KEY (https://ebird.org/api/keygen)")

    regions = _get(f"/ref/region/list/subnational1/{args.country}", key)
    out = {}
    now = datetime.now(timezone.utc).isoformat()
    for region in regions:
        code = region["code"]
        info = _get(f"/ref/region/info/{code}", key)
        species = _get(f"/product/spplist/{code}", key)
        out[code] = {
            "region": {"code": code, "name": region["name"], "info": info},
            "species": species,
            "updatedAt": now,
        }
        time.sleep(0.5)

    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}: {len(out)} regions")


if __name__ == "__main__":
    main()
