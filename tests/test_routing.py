"""Router parity tier — behaviors pinned by the reference suite
(``/root/reference/tests/test_route.py``), re-asserted against the
engine's router."""

import datetime

import pytest

from interlinked_spark.routing import Router, compile_route


def test_exact_routes():
    routes = {"one": 1, "one.two": 2, "one.two.three": 3}
    router = Router()
    router.add_routes(routes)
    for key, value in routes.items():
        assert router.match(key).value == value
    for miss in ("spam", "one.spam.three"):
        assert router.match(miss) is None


def test_parameterized_routes():
    router = Router(
        **{
            "{one:identifier}": lambda one: one,
            "one.{two:identifier}": lambda two: two,
            "one.{two:identifier}.{three:identifier}": lambda two, three: (two, three),
        }
    )
    m = router.match("a")
    assert m.value(**m.kw) == "a"
    m = router.match("one.b")
    assert m.value(**m.kw) == "b"
    m = router.match("one.b.c")
    assert m.value(**m.kw) == ("b", "c")
    for miss in ("spam.b.c", "one.b.c.d"):
        assert router.match(miss) is None


def test_placeholder_types():
    router = Router(
        **{
            "one/{one:int}": lambda one: one,
            "two/{two:str}": lambda two: two,
            "/three/{parents:path}/{name}.{ext}": lambda parents, name, ext: [parents, name, ext],
            "four/{four:uuid}": lambda four: four,
            "five_{ham}_{spam}": lambda ham, spam: (ham, spam),
            "six_{ham}-{spam:uuid}": lambda ham, spam: (ham, spam),
            "seven_{dt:datetime}": lambda dt: dt,
        }
    )

    # int placeholder matches digits but the captured value STAYS A STRING
    m = router.match("one/10")
    assert m.value(**m.kw) == "10"
    assert router.match("one/ten") is None

    m = router.match("two/two")
    assert m.value(**m.kw) == "two"

    m = router.match("/three/some/path/file.txt")
    # path is greedy up to the next literal
    assert m.kw["name"] == "file" and m.kw["ext"] == "txt"

    # uuid: case-insensitive match
    for u in (
        "40B4550B-F1DD-4846-BC70-D8F5F235E72B",
        "40b4550b-f1dd-4846-bc70-d8f5f235e72b",
    ):
        m = router.match("four/" + u)
        assert m.value(**m.kw) == u

    # greedy default-str ambiguity: first hole eats as much as it can
    m = router.match("five_one_two_three")
    assert m.value(**m.kw) == ("one_two", "three")

    # typed second hole disambiguates the dash split
    m = router.match("six_one-40b4550b-f1dd-4846-bc70-d8f5f235e72b")
    assert m.value(**m.kw) == ("one", "40b4550b-f1dd-4846-bc70-d8f5f235e72b")

    # ISO-8601 with explicit offset
    m = router.match("seven_2021-01-01T12:00:00+02:00")
    dt = datetime.datetime.fromisoformat(m.value(**m.kw))
    assert dt.tzinfo == datetime.timezone(datetime.timedelta(hours=2))
    assert (dt.year, dt.month, dt.day, dt.hour) == (2021, 1, 1, 12)

    # naive datetime
    m = router.match("seven_2021-01-01T12:00:00")
    dt = datetime.datetime.fromisoformat(m.value(**m.kw))
    assert dt.tzinfo is None


def test_anonymous_placeholder_rejected():
    with pytest.raises(ValueError):
        compile_route("bad.{}")


def test_insertion_order_wins():
    router = Router()
    router.add("{xx}", "first")
    router.add("{xx:identifier}", "second")
    assert router.match("anything").value == "first"


def test_single_char_placeholder_is_literal():
    # Quirk parity: placeholder names need >= 2 chars; "{x}" is a literal.
    router = Router()
    router.add("{x}", "lit")
    assert router.match("{x}").value == "lit"
    assert router.match("anything") is None


def test_exact_beats_pattern():
    router = Router()
    router.add("{xx}", "pattern")
    router.add("literal", "exact")
    assert router.match("literal").value == "exact"
    assert router.match("literal").kw == {}


def test_contains_is_on_patterns():
    router = Router()
    router.add("a.{b}", 1)
    assert "a.{b}" in router
    assert "a.c" not in router  # matchable but not a registered pattern


def test_clone_is_independent():
    router = Router()
    router.add("a", 1)
    twin = router.clone()
    twin.add("b", 2)
    assert "b" in twin and "b" not in router
