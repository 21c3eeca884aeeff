"""Kernel combinators: sum and product covariance families.

The reference ships five fixed covariance modules and no way to compose
them (lib/interfaces.ml keeps one ``Spec`` per engine instantiation).
Composition is where GP modelling power actually comes from — a trend is
``const + lin_ard + se_iso`` (exactly equivalent to integrating out the
coefficients of an explicit constant-plus-linear mean function under
Gaussian priors, GPML section 2.7), quasi-periodic structure is
``periodic * se_iso``, and so on.  Sums and elementwise products of
covariance functions are covariance functions (closure under addition;
Schur product theorem), so every engine path — FITC/FIC evidence,
predictions, all the Laplace/EP likelihood families, the mesh-sharded
objectives — works unchanged.

Design: a combinator *family* is a cached, hashable instance whose
methods mirror the static-method protocol of the base families
(kernels/base.py ``KernelFamily``).  Its parameters are one PyTree
dataclass holding the tuple of per-term params, so ``jax.grad`` and the
hyper pack (optim/pack.py) see every term hyper as ordinary leaves.

Inducing representation: the raw input-space Z (m, d) — each term's
kernel-specific representation (lin_ard pre-scales, se_fat projects;
see kernels/base.py:13-16) is re-derived *inside* every method via
``term.inducing_from_inputs``.  This keeps one shared, learnable set of
inducing coordinates whose gradients flow through each term's transform.

Names are structural — ``sum(se_iso,lin_ard)`` — and ``resolve_family``
(kernels/__init__.py) parses them back, so combinator models persist
through the standard checkpoint artifact and the CLI ``-kernel`` flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tree import pytree_dataclass


@pytree_dataclass
class CombParams:
    """Parameters of a combinator: a tuple of per-term param PyTrees."""

    terms: tuple


class _Combinator:
    """Family object for ``sum``/``prod`` of base (or nested) families.

    Instances are immutable, hashable, and interned (see ``_make``), so
    they behave exactly like the base family classes as jit-static
    values.
    """

    Params = CombParams

    def __init__(self, op: str, terms: tuple):
        assert op in ("sum", "prod")
        self._op = op
        self.terms = terms
        self.name = f"{op}({','.join(t.name for t in terms)})"
        self.learn_inducing_default = any(
            t.learn_inducing_default for t in terms
        )

    def __repr__(self):
        return f"<kernel family {self.name}>"

    def __eq__(self, other):
        return (
            isinstance(other, _Combinator)
            and self._op == other._op
            and self.terms == other.terms
        )

    def __hash__(self):
        return hash((self._op, self.terms))

    # -- protocol ----------------------------------------------------------

    def default_params(self, X, n_inducing, key=None) -> CombParams:
        if key is not None:
            keys = jax.random.split(key, len(self.terms))
        else:
            keys = [None] * len(self.terms)
        return CombParams(
            terms=tuple(
                t.default_params(X, n_inducing, k)
                for t, k in zip(self.terms, keys)
            )
        )

    def inducing_from_inputs(self, params, X):
        return X  # raw input space; terms re-derive their own rep

    def _reduce(self, parts):
        out = parts[0]
        for p in parts[1:]:
            out = out + p if self._op == "sum" else out * p
        return out

    def _per_term(self, params, fn):
        return self._reduce(
            [fn(t, tp) for t, tp in zip(self.terms, params.terms)]
        )

    def k_upper(self, params, Z):
        return self._per_term(
            params,
            lambda t, tp: t.k_upper(tp, t.inducing_from_inputs(tp, Z)),
        )

    def k_diag(self, params, X):
        return self._per_term(params, lambda t, tp: t.k_diag(tp, X))

    def k_cross(self, params, X, Z):
        return self._per_term(
            params,
            lambda t, tp: t.k_cross(tp, X, t.inducing_from_inputs(tp, Z)),
        )

    def k_upper_inputs(self, params, X):
        return self._per_term(params, lambda t, tp: t.k_upper_inputs(tp, X))

    def k_cross_inputs(self, params, X1, X2):
        from .base import cross_inputs

        return self._per_term(
            params, lambda t, tp: cross_inputs(t, tp, X1, X2)
        )

    def k_one(self, params, x):
        return self._per_term(params, lambda t, tp: t.k_one(tp, x))

    def k_upper_cols(self, params, Z, j0, m_t):
        """Column block of k_upper without forming (m, m) — composes the
        per-term blocks so combinators work on the fully distributed
        inducing path (kernels/base.py ``k_upper_cols``)."""
        from .base import k_upper_cols as base_cols

        parts = []
        for t, tp in zip(self.terms, params.terms):
            z_t = t.inducing_from_inputs(tp, Z)
            if hasattr(t, "k_upper_cols"):
                parts.append(t.k_upper_cols(tp, z_t, j0, m_t))
            else:
                parts.append(base_cols(t, tp, z_t, j0, m_t))
        return self._reduce(parts)


class _Cols:
    """Column-restriction wrapper: the wrapped family evaluated on input
    columns [lo, hi) only.  This is what gives kernels *active
    dimensions* — additive models over feature groups
    (``sum(cols(se_iso,0,3),cols(lin_ard,3,8))``) and the ICM
    multi-output composition (kernels/task.py) both need terms that see
    different slices of the same rows.

    Params are a one-term ``CombParams`` so the checkpoint codec's
    structure-directed traversal (io/checkpoint.py ``_params_from_arrays``
    follows ``family.terms``) persists them with no new cases.  The
    shared inducing set Z stays FULL-width; each evaluation slices it
    and re-derives the term's representation, so Z gradients flow only
    through the selected columns (the rest get zero cotangent from the
    slice, exactly right).
    """

    Params = CombParams

    def __init__(self, term, lo: int, hi: int):
        if not 0 <= int(lo) < int(hi):
            raise ValueError("cols needs 0 <= lo < hi")
        self.terms = (term,)
        self._lo, self._hi = int(lo), int(hi)
        self.name = f"cols({term.name},{self._lo},{self._hi})"
        self.learn_inducing_default = term.learn_inducing_default

    def __repr__(self):
        return f"<kernel family {self.name}>"

    def __eq__(self, other):
        return (
            isinstance(other, _Cols)
            and self.terms == other.terms
            and (self._lo, self._hi) == (other._lo, other._hi)
        )

    def __hash__(self):
        return hash(("cols", self.terms, self._lo, self._hi))

    def _s(self, A):
        return A[..., self._lo : self._hi]

    # -- protocol ------------------------------------------------------

    def default_params(self, X, n_inducing, key=None) -> CombParams:
        t = self.terms[0]
        return CombParams(
            terms=(t.default_params(self._s(X), n_inducing, key),)
        )

    def inducing_from_inputs(self, params, X):
        return X  # full-width; sliced at every evaluation

    def k_upper(self, params, Z):
        t, tp = self.terms[0], params.terms[0]
        zs = self._s(Z)
        return t.k_upper(tp, t.inducing_from_inputs(tp, zs))

    def k_diag(self, params, X):
        t, tp = self.terms[0], params.terms[0]
        return t.k_diag(tp, self._s(X))

    def k_cross(self, params, X, Z):
        t, tp = self.terms[0], params.terms[0]
        zs = self._s(Z)
        return t.k_cross(tp, self._s(X), t.inducing_from_inputs(tp, zs))

    def k_upper_inputs(self, params, X):
        t, tp = self.terms[0], params.terms[0]
        return t.k_upper_inputs(tp, self._s(X))

    def k_cross_inputs(self, params, X1, X2):
        from .base import cross_inputs

        t, tp = self.terms[0], params.terms[0]
        return cross_inputs(t, tp, self._s(X1), self._s(X2))

    def k_one(self, params, x):
        t, tp = self.terms[0], params.terms[0]
        return t.k_one(tp, self._s(x))

    def k_upper_cols(self, params, Z, j0, m_t):
        from .base import k_upper_cols as base_cols

        t, tp = self.terms[0], params.terms[0]
        zs = t.inducing_from_inputs(tp, self._s(Z))
        if hasattr(t, "k_upper_cols"):
            return t.k_upper_cols(tp, zs, j0, m_t)
        return base_cols(t, tp, zs, j0, m_t)


_INTERNED: dict = {}


def _make(op: str, terms: tuple) -> _Combinator:
    key = (op, terms)
    fam = _INTERNED.get(key)
    if fam is None:
        fam = _INTERNED[key] = _Combinator(op, terms)
    return fam


def sum_family(*terms) -> _Combinator:
    """Covariance sum: k = k_1 + k_2 + ...  (at least two terms)."""
    if len(terms) < 2:
        raise ValueError("sum_family needs at least two terms")
    return _make("sum", tuple(terms))


def product_family(*terms) -> _Combinator:
    """Covariance product: k = k_1 * k_2 * ...  (Schur product theorem)."""
    if len(terms) < 2:
        raise ValueError("product_family needs at least two terms")
    return _make("prod", tuple(terms))


_COLS_INTERNED: dict = {}


def cols_family(term, lo: int, hi: int) -> _Cols:
    """``term`` restricted to input columns [lo, hi)."""
    key = (term, int(lo), int(hi))
    fam = _COLS_INTERNED.get(key)
    if fam is None:
        fam = _COLS_INTERNED[key] = _Cols(*key)
    return fam


def _split_top(inner: str) -> list[str]:
    """Split on top-level commas (paren-depth aware)."""
    args, depth, start = [], 0, 0
    for i, ch in enumerate(inner):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(inner[start:i])
            start = i + 1
    args.append(inner[start:])
    return args


def parse_family(name: str, base: dict):
    """Parse a structural kernel name back into a family object.

    Grammar (nested arbitrarily), e.g.
    ``sum(prod(periodic,se_iso),lin_one)``,
    ``prod(cols(task(2,1),8,9),cols(se_iso,0,8))``:

        NAME | sum(K,K,...) | prod(K,K,...) | cols(K,lo,hi) | task(T,R)

    ``base`` is the flat registry of base families (kernels.FAMILIES).
    """
    name = name.strip()
    if name in base:
        return base[name]
    for op in ("sum", "prod"):
        if name.startswith(op + "(") and name.endswith(")"):
            args = _split_top(name[len(op) + 1 : -1])
            terms = tuple(parse_family(a, base) for a in args)
            return _make(op, terms)
    if name.startswith("cols(") and name.endswith(")"):
        args = _split_top(name[5:-1])
        if len(args) != 3:
            raise KeyError(f"cols(...) takes (kernel, lo, hi): {name!r}")
        return cols_family(
            parse_family(args[0], base), int(args[1]), int(args[2])
        )
    if name.startswith("task(") and name.endswith(")"):
        args = _split_top(name[5:-1])
        if len(args) != 2:
            raise KeyError(f"task(...) takes (n_tasks, rank): {name!r}")
        from .task import task_family

        return task_family(int(args[0]), int(args[1]))
    raise KeyError(
        f"unknown kernel family {name!r}: not a base family "
        f"({', '.join(sorted(base))}) nor "
        f"sum(...)/prod(...)/cols(...)/task(...)"
    )
