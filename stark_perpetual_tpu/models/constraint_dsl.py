"""Tiny constraint-expression DSL: one definition, two evaluators.

Every AIR in this framework must provide the same transition constraints
twice: once over host Python ints (the verifier evaluates them at query
points) and once over device Montgomery limb arrays (the prover evaluates
them lane-wise across the LDE domain). The existing AIRs hand-write both;
this module lets new AIRs write each constraint ONCE as a small expression
tree referencing symbolic inputs, then:

  - ``eval_host(exprs, cur, nxt, pub, chal)`` evaluates with int
    arithmetic mod p (verifier path), and
  - ``eval_device(exprs, f, cur, nxt, pub, chal)`` walks the same trees
    with ``Field`` limb ops in the Montgomery domain (prover path),
    caching common subexpressions so shared terms trace once.

Expression nodes are immutable and hash-consed by construction identity,
so a constraint list built in an AIR's __init__ can be reused across
proofs. Constants are embedded as Python ints and lifted per evaluation
(host: mod p; device: Montgomery limb rows broadcast to the lane shape).
"""

from typing import List, Sequence

from stark_perpetual_tpu.params import FIELD_PRIME


class Expr:
    """A node of the constraint expression tree."""

    __slots__ = ("op", "args", "_hash")

    def __init__(self, op, args):
        self.op = op
        self.args = tuple(args)
        self._hash = hash((op, self.args))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (
            isinstance(other, Expr) and self.op == other.op and self.args == other.args
        )

    # -- builders ----------------------------------------------------------

    @staticmethod
    def _lift(v):
        if isinstance(v, Expr):
            return v
        assert isinstance(v, int)
        return Expr("const", (v % FIELD_PRIME,))

    def __add__(self, other):
        return Expr("add", (self, Expr._lift(other)))

    def __radd__(self, other):
        return Expr("add", (Expr._lift(other), self))

    def __sub__(self, other):
        return Expr("sub", (self, Expr._lift(other)))

    def __rsub__(self, other):
        return Expr("sub", (Expr._lift(other), self))

    def __mul__(self, other):
        return Expr("mul", (self, Expr._lift(other)))

    def __rmul__(self, other):
        return Expr("mul", (Expr._lift(other), self))

    def __neg__(self):
        return Expr("sub", (Expr._lift(0), self))


def cur(i: int) -> Expr:
    """Current-row value of trace column i (main then interaction)."""
    return Expr("cur", (i,))


def nxt(i: int) -> Expr:
    """Next-row value of trace column i."""
    return Expr("nxt", (i,))


def pub(i: int) -> Expr:
    """Public (uncommitted) column i."""
    return Expr("pub", (i,))


def chal(i: int) -> Expr:
    """Challenge i (drawn + derived, in framework order)."""
    return Expr("chal", (i,))


def const(v: int) -> Expr:
    return Expr._lift(v)


def eval_host(
    exprs: Sequence[Expr], cur_vals, nxt_vals, pub_vals, chal_vals
) -> List[int]:
    """Evaluate expression trees over ints mod p (verifier path)."""
    p = FIELD_PRIME
    cache = {}

    def ev(e: Expr) -> int:
        got = cache.get(e)
        if got is not None:
            return got
        op = e.op
        if op == "const":
            v = e.args[0]
        elif op == "cur":
            v = cur_vals[e.args[0]] % p
        elif op == "nxt":
            v = nxt_vals[e.args[0]] % p
        elif op == "pub":
            v = pub_vals[e.args[0]] % p
        elif op == "chal":
            v = chal_vals[e.args[0]] % p
        elif op == "add":
            v = (ev(e.args[0]) + ev(e.args[1])) % p
        elif op == "sub":
            v = (ev(e.args[0]) - ev(e.args[1])) % p
        else:  # mul
            v = ev(e.args[0]) * ev(e.args[1]) % p
        cache[e] = v
        return v

    return [ev(e) for e in exprs]


def eval_device(exprs: Sequence[Expr], f, cur_vals, nxt_vals, pub_vals, chal_vals):
    """Evaluate the same trees over Montgomery limb arrays (prover path).

    All leaf arrays must share one lane shape (rows, 21); constants are
    packed as Montgomery rows and broadcast. Common subexpressions are
    cached so shared terms appear once in the traced graph.
    """
    import jax.numpy as jnp

    shape = None
    for vals in (cur_vals, nxt_vals, pub_vals, chal_vals):
        for v in vals:
            shape = v.shape
            break
        if shape is not None:
            break
    cache = {}

    def ev(e: Expr):
        got = cache.get(e)
        if got is not None:
            return got
        op = e.op
        if op == "const":
            v = jnp.broadcast_to(
                jnp.asarray(f.pack((e.args[0] << 252) % FIELD_PRIME)), shape
            )
        elif op == "cur":
            v = cur_vals[e.args[0]]
        elif op == "nxt":
            v = nxt_vals[e.args[0]]
        elif op == "pub":
            v = pub_vals[e.args[0]]
        elif op == "chal":
            v = jnp.broadcast_to(chal_vals[e.args[0]], shape)
        elif op == "add":
            v = f.add(ev(e.args[0]), ev(e.args[1]))
        elif op == "sub":
            v = f.sub(ev(e.args[0]), ev(e.args[1]))
        else:  # mul
            v = f.mont_mul(ev(e.args[0]), ev(e.args[1]))
        cache[e] = v
        return v

    return [ev(e) for e in exprs]


class DslAir:
    """Air mixin: subclasses set ``self._exprs`` (list of Expr) once and
    inherit both evaluation paths. Leaf index spaces: cur/nxt cover main
    then interaction columns; pub covers public_columns(); chal covers
    drawn + derived challenges."""

    def transition_exprs_host_chal(self, cur_vals, nxt_vals, pub_vals, chal_vals):
        if not pub_vals:
            # Constraint-count probe from the framework: honor it without
            # public columns by substituting zeros.
            pub_vals = [0] * getattr(self, "n_public_columns", 0)
        return eval_host(self._exprs, cur_vals, nxt_vals, pub_vals, chal_vals)

    def eval_transitions_chal(self, f, cur_vals, nxt_vals, pub_vals, chal_vals):
        return eval_device(self._exprs, f, cur_vals, nxt_vals, pub_vals, chal_vals)
