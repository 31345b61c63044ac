"""Cross-run caching by stacking ``functools.lru_cache`` under
``provide`` (reference analog: ``examples/caching.py:16-20``).

The workflow memo lasts one ``run()``; ``lru_cache`` outlives it, so a
provider decorated with both is fetched once per distinct argument set
across runs.  Run: ``python examples/caching.py``.
"""

from datetime import date, timedelta
from functools import lru_cache

from interlinked_spark import Workflow

wkf = Workflow("caching-example")
calls = {"fetch": 0, "avg": 0}


@wkf.provide("temperature.{city:identifier}")
@lru_cache
def temperature(for_date: date, city: str) -> int:
    """Stand-in for an expensive remote fetch."""
    calls["fetch"] += 1
    return (len(city) * 3 + for_date.day) % 35


@wkf.depend(bru="temperature.brussels", par="temperature.paris")
@wkf.provide("temperature_average")
def average(bru: int, par: int, for_date: date) -> float:
    calls["avg"] += 1
    return (bru + par) / 2


if __name__ == "__main__":
    today = date(2026, 8, 13)
    tomorrow = today + timedelta(days=1)
    wkf.run("temperature_average", for_date=today)
    wkf.run("temperature_average", for_date=today)  # fetches hit lru_cache
    wkf.run("temperature_average", for_date=tomorrow)  # new args -> refetch
    assert calls == {"fetch": 4, "avg": 3}, calls
    print(f"fetches: {calls['fetch']} (not 6), averages: {calls['avg']}")
