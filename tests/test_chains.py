"""Samples/Chains query language and container semantics."""
import numpy as np
from jax import numpy as jnp

from montecosmo_tpu.chains import Chains, Samples


def make():
    data = {"a": jnp.arange(4.0), "b": jnp.arange(4.0) + 10,
            "c": jnp.arange(4.0) + 20, "d": jnp.arange(8.0).reshape(4, 2)}
    groups = {"ab": ["a", "b"], "cd": ["c", "d"]}
    return Samples(data, groups=groups)


def test_value_and_group_queries():
    s = make()
    np.testing.assert_array_equal(np.asarray(s["a"]), np.arange(4.0))
    vals = s["ab"]
    assert isinstance(vals, tuple) and len(vals) == 2
    np.testing.assert_array_equal(np.asarray(vals[1]), np.arange(4.0) + 10)


def test_star_and_complement():
    s = make()
    assert len(s["*"]) == 4
    # everything except a group
    rest = s[["*~ab"]]
    assert list(rest.data) == ["c", "d"]
    # removal from a running selection
    sel = s[["*", "~cd"]]
    assert list(sel.data) == ["a", "b"]
    # complement of a single key
    assert list(s[["*~a"]].data) == ["b", "c", "d"]


def test_tuple_query_recursion():
    s = make()
    one, rest = s[(["a"], ["*~a"])]
    assert list(one.data) == ["a"]
    assert list(rest.data) == ["b", "c", "d"]


def test_duplicate_positional_semantics():
    """Two groups sharing a key keep positional correspondence."""
    s = Samples({"x": jnp.zeros(2), "y": jnp.ones(2)},
                groups={"g1": ["x", "y"], "g2": ["y"]})
    vals = s[("g1", "g2")]
    assert len(vals) == 3  # x, y, y — duplicates preserved


def test_global_indexing():
    s = make()
    sub = s[1:3]
    assert sub.shape["a"] == (2,)
    assert sub.shape["d"] == (2, 2)
    picked = s[np.array([0, 3])]
    assert picked.shape["a"] == (2,)


def test_get_missing_semantics():
    s = make()
    assert s.get("nope") is None            # value query -> None
    assert list(s.get(["nope"]).data) == []  # subdict query -> dropped
    try:
        s["nope"]
    except KeyError:
        pass
    else:
        raise AssertionError("missing key must raise without default")
    assert float(s.get("nope2", lambda k: jnp.asarray(7.0))) == 7.0


def test_union_operators():
    s = make()
    merged = s | {"e": jnp.zeros(1)}
    assert "e" in merged.data and "a" in merged.data
    rmerged = {"a": jnp.zeros(4)} | s
    np.testing.assert_array_equal(np.asarray(rmerged["a"]), np.arange(4.0))
    s2 = Samples({"f": jnp.ones(1)}, groups={"fg": ["f"]})
    both = s | s2
    assert "f" in both.data and both.groups["ab"] == ["a", "b"]
    assert both.groups["fg"] == ["f"]


def test_wrapping_inherits_attributes():
    s = make()
    wrapped = Chains(s, labels={"a": "A"})
    assert wrapped.groups == s.groups
    assert wrapped.labels == {"a": "A"}
    assert list(wrapped.data) == list(s.data)


def test_stackby():
    s = make()
    st = s.stackby("ab", axis=-1)
    assert "ab" in st.data and st.data["ab"].shape == (4, 2)
    assert "a" not in st.data and "b" not in st.data
    # single-member group stays unstacked
    s2 = Samples({"x": jnp.zeros(3)}, groups={"gx": ["x"]})
    st2 = s2.stackby("gx")
    assert st2.data["gx"].shape == (3,)


def test_prune():
    s = make()
    sub = s[["a"]]
    pruned = sub.prune()
    assert pruned.groups["ab"] == ["a"] and pruned.groups["cd"] == []


def test_pytree_roundtrip():
    import jax

    s = make()
    doubled = jax.tree.map(lambda x: 2 * x, s)
    assert isinstance(doubled, Samples)
    np.testing.assert_array_equal(np.asarray(doubled["a"]), 2 * np.arange(4.0))
    assert doubled.groups == s.groups
