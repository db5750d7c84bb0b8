#!/usr/bin/env python
"""Deterministic event-stream generator (S21 — the reference's faker-based
pizza-order producers, notebooks/03.ingestas_eventos/01.datasource [json].py,
reimagined without external deps or a broker): drops order events as
timestamped landing-zone JSON files that the ingestion engine drains.

    python tools/gen_events.py <landing_root> [n_batches] [orders_per_batch]
"""

from __future__ import annotations

import hashlib
import json
import sys
from datetime import datetime, timedelta, timezone
from pathlib import Path

PRODUCTS = ("margherita", "pepperoni", "hawaiian", "veggie", "quattro")
TOPPINGS = ("olives", "mushrooms", "onion", "extra cheese", "basil")


def _det(seed: str, n: int) -> int:
    """Deterministic pseudo-random int in [0, n) from a string seed."""
    return int.from_bytes(hashlib.blake2b(seed.encode(), digest_size=4).digest(), "big") % n


def gen_order(batch: int, i: int, base_ts: datetime) -> dict:
    seed = f"{batch}:{i}"
    n_pizzas = 1 + _det(seed + ":n", 3)
    return {
        "order_id": batch * 10_000 + i,
        "ts": (base_ts + timedelta(seconds=_det(seed + ":t", 3600))).isoformat(),
        "customer_id": _det(seed + ":c", 200),
        "pizzas": [
            {
                "pizzaName": PRODUCTS[_det(f"{seed}:{p}:name", len(PRODUCTS))],
                "additionalToppings": [
                    TOPPINGS[_det(f"{seed}:{p}:top{t}", len(TOPPINGS))]
                    for t in range(_det(f"{seed}:{p}:nt", 3))
                ],
            }
            for p in range(n_pizzas)
        ],
        "total": round(8.5 * n_pizzas + _det(seed + ":x", 500) / 100, 2),
    }


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/events_landing")
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    base = datetime(2026, 3, 1, tzinfo=timezone.utc)
    day_dir = root / "pizzeria" / "orders" / base.strftime("%Y/%m/%d")
    day_dir.mkdir(parents=True, exist_ok=True)
    for b in range(n_batches):
        f = day_dir / f"pizzeria-orders-{base:%Y%m%d}{b:06d}.json"
        f.write_text(
            "\n".join(json.dumps(gen_order(b, i, base)) for i in range(per_batch))
        )
        print(f"landed {f} ({per_batch} orders)")


if __name__ == "__main__":
    main()
