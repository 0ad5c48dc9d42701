"""Pickle support for expression trees.

The reference's expressions pickle out of the box (numpy callables pickle
by name; see ``tests/test_collection.py::test_array_pickle_drops_lowered_expr_cache``).
Here many operand callables are ``jax.numpy`` attributes — ``jnp.ufunc``
wrappers and aliased functions whose ``__qualname__`` does not match their
public import path, so stock pickle rejects them.  This module encodes such
callables *by public attribute path* (identity-matched against the live
module namespaces) and restores them with ``getattr`` on load.

Encoding is recursive over tuples/lists/dicts/sets/``functools.partial`` so
callables buried in kwargs tuples are found.  Anything not in the registry
is passed through to stock pickle untouched.
"""

from __future__ import annotations

import functools

_REGISTRY = None  # id(obj) -> (obj, module path, attr name); the strong ref
# keeps the id stable — without it a module __getattr__ that synthesizes
# per-access objects could recycle an id onto an unrelated callable.


def _registry():
    global _REGISTRY
    if _REGISTRY is None:
        import jax
        import jax.numpy as jnp

        mods = {
            "jax.numpy": jnp,
            "jax.numpy.linalg": jnp.linalg,
            "jax.numpy.fft": jnp.fft,
            "jax.lax": jax.lax,
            "jax.nn": jax.nn,
            "jax.scipy.special": jax.scipy.special,
        }
        reg = {}
        for modname, mod in mods.items():
            for attr in dir(mod):
                if attr.startswith("_"):
                    continue
                try:
                    obj = getattr(mod, attr)
                except Exception:
                    continue
                if callable(obj) and not isinstance(obj, type):
                    # first (shortest) path wins for aliased objects
                    reg.setdefault(id(obj), (obj, modname, attr))
        _REGISTRY = reg
    return _REGISTRY


class _ByName:
    """Pickle payload: a callable identified by its public attribute path."""

    __slots__ = ("mod", "attr")

    def __init__(self, mod, attr):
        self.mod = mod
        self.attr = attr

    def __reduce__(self):
        return (_ByName, (self.mod, self.attr))

    def resolve(self):
        import importlib

        return getattr(importlib.import_module(self.mod), self.attr)

    def __call__(self, *args, **kwargs):
        # callable so functools.partial accepts an encoded func
        return self.resolve()(*args, **kwargs)


def encode_operand(op):
    """Swap registry callables for by-name markers, recursively."""
    if callable(op) and not isinstance(op, type):
        hit = _registry().get(id(op))
        if hit is not None and hit[0] is op:
            return _ByName(hit[1], hit[2])
        if isinstance(op, functools.partial):
            return functools.partial(
                encode_operand(op.func),
                *[encode_operand(a) for a in op.args],
                **{k: encode_operand(v) for k, v in op.keywords.items()},
            )
        return op
    if type(op) is tuple:
        return tuple(encode_operand(o) for o in op)
    if type(op) is list:
        return [encode_operand(o) for o in op]
    if type(op) is dict:
        return {k: encode_operand(v) for k, v in op.items()}
    if type(op) is frozenset:
        return frozenset(encode_operand(o) for o in op)
    return op


def decode_operand(op):
    if isinstance(op, _ByName):
        return op.resolve()
    if isinstance(op, functools.partial):
        return functools.partial(
            decode_operand(op.func),
            *[decode_operand(a) for a in op.args],
            **{k: decode_operand(v) for k, v in op.keywords.items()},
        )
    if type(op) is tuple:
        return tuple(decode_operand(o) for o in op)
    if type(op) is list:
        return [decode_operand(o) for o in op]
    if type(op) is dict:
        return {k: decode_operand(v) for k, v in op.items()}
    if type(op) is frozenset:
        return frozenset(decode_operand(o) for o in op)
    return op


def unpickle_expr(cls, operands):
    """Rebuild an expression node from decoded operands.

    Goes through ``cls(*operands)`` so singleton dedup re-registers the node
    (and pickle's own memo preserves DAG sharing across the tree).
    """
    return cls(*[decode_operand(o) for o in operands])
