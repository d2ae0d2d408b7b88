"""Sum-product loopy belief propagation over small per-document factor
graphs (SURVEY.md §2 M8 — the reference's joint coref+typing+linking
inference, bp/SimpleFactorGraph.scala + bp/Node.scala + bp/Factor.scala,
driven by JointDocFactorGraphOnto.scala:297-317 computeAndStoreMarginals).

The reference builds one factor graph PER DOCUMENT (nodes: antecedent
choice per mention, NER label per token, wiki denotation per mention;
factors: unary scores plus agreement factors gated on the antecedent
choice) and runs a fixed number of synchronous message-passing rounds
(passMessagesOneRound, JointDocFactorGraphOnto.scala:417-451), then
decodes each node's marginal independently.  Documents are independent —
the M11 embarrassing parallelism — so the Spark shape is applyInPandas
over doc groups with THIS engine running inside the Arrow kernel: the
graph for one web page has tens of nodes, a numpy-table engine is the
right tool, and nothing about BP itself needs the cluster.

Kept deliberately generic (domains of any size, factors of arity 1-3 as
dense log-potential tables) so tests can brute-force-verify exactness on
tree-structured graphs and the joint operator can add factor families
without touching the engine.  All message updates are normalized in
probability space (the reference normalizes too, Node.scala) and run in a
fixed order, so results are bit-deterministic for a given graph.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-300


class FactorGraph:
    """Nodes with finite domains + dense-table factors of arity 1..3.

    add_node(size) -> node id; add_factor(node_ids, log_table) where
    log_table.shape == tuple(domain sizes).  Messages are synchronous
    per-round (factor->node from current node->factor, then node->factor
    from the new factor->node), matching the reference's
    passMessagesOneRound full sweep."""

    def __init__(self) -> None:
        self._sizes: list[int] = []
        self._factors: list[tuple[tuple[int, ...], np.ndarray]] = []

    def add_node(self, size: int) -> int:
        if size < 1:
            raise ValueError("empty domain")
        self._sizes.append(int(size))
        return len(self._sizes) - 1

    def add_factor(self, nodes: tuple[int, ...] | list[int], log_table: np.ndarray) -> None:
        nodes = tuple(int(n) for n in nodes)
        table = np.asarray(log_table, dtype=np.float64)
        if table.shape != tuple(self._sizes[n] for n in nodes):
            raise ValueError(
                f"table shape {table.shape} != domains "
                f"{tuple(self._sizes[n] for n in nodes)}"
            )
        if len(nodes) != len(set(nodes)):
            raise ValueError("repeated node in one factor")
        self._factors.append((nodes, table))

    # -------------------------------------------------------------- BP

    def marginals(self, n_iters: int = 8) -> list[np.ndarray]:
        """Per-node marginals after n_iters synchronous rounds.

        Exact on tree-structured graphs once n_iters >= diameter (verified
        against brute-force enumeration in tests/test_joint.py); the loopy
        approximation elsewhere, like the reference."""
        sizes = self._sizes
        pots = [np.exp(t - t.max()) + _EPS for _, t in self._factors]
        # messages indexed by (factor_idx, slot): node->factor and factor->node
        n2f = [
            [np.full(sizes[n], 1.0 / sizes[n]) for n in nodes]
            for nodes, _ in self._factors
        ]
        f2n = [
            [np.full(sizes[n], 1.0 / sizes[n]) for n in nodes]
            for nodes, _ in self._factors
        ]
        # node -> list of (factor_idx, slot) touching it
        touching: list[list[tuple[int, int]]] = [[] for _ in sizes]
        for fi, (nodes, _) in enumerate(self._factors):
            for slot, n in enumerate(nodes):
                touching[n].append((fi, slot))

        def _norm(v: np.ndarray) -> np.ndarray:
            s = v.sum()
            return v / s if s > 0 else np.full_like(v, 1.0 / len(v))

        for _ in range(max(1, n_iters)):
            # factor -> node: marginalize the table against the OTHER slots'
            # incoming node messages
            for fi, (nodes, _) in enumerate(self._factors):
                table = pots[fi]
                for slot in range(len(nodes)):
                    acc = table
                    # multiply in other slots' messages then sum them out,
                    # always reducing the highest axis first so slot axes
                    # keep their positions
                    for other in range(len(nodes) - 1, -1, -1):
                        if other == slot:
                            continue
                        msg = n2f[fi][other]
                        shape = [1] * acc.ndim
                        shape[other] = len(msg)
                        acc = (acc * msg.reshape(shape)).sum(axis=other)
                    f2n[fi][slot] = _norm(acc)
            # node -> factor: product of the other factors' messages
            for n, touch in enumerate(touching):
                if not touch:
                    continue
                prod = np.ones(sizes[n])
                for fi, slot in touch:
                    prod = prod * f2n[fi][slot]
                for fi, slot in touch:
                    out = prod / np.maximum(f2n[fi][slot], _EPS)
                    n2f[fi][slot] = _norm(out)
        out = []
        for n, touch in enumerate(touching):
            belief = np.ones(sizes[n])
            for fi, slot in touch:
                belief = belief * f2n[fi][slot]
            out.append(_norm(belief))
        return out

    def decode(self, n_iters: int = 8) -> list[int]:
        """Per-node argmax of the sum-product marginals (the reference's
        decodeCorefProduceBackpointers / decodeWikificationProduceChunks
        pattern, JointDocFactorGraphOnto.scala:453-530); ties break to the
        smallest domain index (np.argmax) for determinism."""
        return [int(np.argmax(m)) for m in self.marginals(n_iters)]

    def brute_force_marginals(self) -> list[np.ndarray]:
        """Exact marginals by full enumeration — test oracle only (the
        joint distribution is exp(sum of log tables); domains multiply, so
        only viable for tiny graphs)."""
        sizes = self._sizes
        total = np.zeros(tuple(sizes))
        for nodes, table in self._factors:
            # place the factor's axes at its nodes' global positions; the
            # padded singleton axes broadcast across non-member nodes
            total = total + np.moveaxis(
                table.reshape(table.shape + (1,) * (len(sizes) - table.ndim)),
                range(table.ndim), nodes,
            )
        joint = np.exp(total - total.max())
        joint = joint / joint.sum()
        return [
            joint.sum(axis=tuple(a for a in range(len(sizes)) if a != n))
            for n in range(len(sizes))
        ]
