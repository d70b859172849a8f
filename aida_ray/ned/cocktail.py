"""CocktailParty greedy dense-subgraph disambiguation.

References:
  - CocktailParty.java:109-1037 (dangling-mention removal, distance
    pruning, iterative min-weighted-degree removal with taboo
    entities, best-objective tracking, final solving)
  - CocktailPartySizeConstrained.java (keep ceil(#mentions * k)
    entities closest to the mentions, squared-distance objective)
  - ShortestPath.java (Dijkstra over distance = 1 - weight)
  - GreedyHillClimbing.java (exhaustive <= maxCombinations, else
    seeded random-restart local search; Random(1337))

Determinism: heap ties break on node id; iteration orders are the
graph-insertion orders; the local-search RNG reproduces
``java.util.Random`` exactly so retried Ray tasks give identical output.
"""

from __future__ import annotations

import heapq
import itertools
import math

from aida_ray.ned.graph import DocGraph
from aida_ray.ned.settings import DisambiguationSettings


class JavaRandom:
    """Bit-exact java.util.Random (LCG, 48-bit state)."""

    __slots__ = ("seed",)
    _MULT = 0x5DEECE66D
    _ADD = 0xB
    _MASK = (1 << 48) - 1

    def __init__(self, seed: int):
        self.seed = (seed ^ self._MULT) & self._MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * self._MULT + self._ADD) & self._MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val


# ---------------------------------------------------------------- shortest path

def dijkstra(g: DocGraph, source: int, removed: list[bool]) -> list[float]:
    """Distances (1 - weight metric) from source to all non-removed nodes."""
    n = g.n_nodes
    dist = [math.inf] * n
    dist[source] = 0.0
    heap = [(0.0, source)]
    done = [False] * n
    while heap:
        d, u = heapq.heappop(heap)
        if done[u] or d > dist[u]:
            continue
        done[u] = True
        for v, w in g.succ[u].items():
            if removed[v]:
                continue
            nd = d + (1.0 - w)
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def closeness(g: DocGraph, source: int, removed: list[bool]) -> list[float]:
    """Sum of weights along the shortest-path tree (ShortestPath.closeness)."""
    n = g.n_nodes
    dist = [math.inf] * n
    close = [-math.inf] * n
    dist[source] = 0.0
    close[source] = 0.0
    heap = [(0.0, source)]
    done = [False] * n
    while heap:
        d, u = heapq.heappop(heap)
        if done[u] or d > dist[u]:
            continue
        done[u] = True
        for v, w in g.succ[u].items():
            if removed[v]:
                continue
            nd = d + (1.0 - w)
            if nd < dist[v]:
                dist[v] = nd
                close[v] = close[u] + w
                heapq.heappush(heap, (nd, v))
    return close


# ---------------------------------------------------------------- hill climbing

class GreedyHillClimbing:
    """Final per-mention assignment when several candidates survive."""

    def __init__(self, g: DocGraph, mention_nodes: list[int],
                 final_entities: set[int], max_exhaustive: int, seed: int):
        self.g = g
        self.mention_nodes = mention_nodes
        self.final_entities = final_entities
        self.max_exhaustive = max_exhaustive
        self.seed = seed

    def _actual_successors(self) -> dict[int, list[int]]:
        g = self.g
        out: dict[int, list[int]] = {}
        for mn in self.mention_nodes:
            if g.removed[mn]:
                continue
            succ = [s for s in g.succ[mn] if not g.removed[s]]
            if succ:
                out[mn] = succ
        return out

    def compute_weight(self, choice: dict[int, int]) -> float:
        """GreedyHillClimbing.computeWeight:60-120 (normalized by #entities)."""
        g = self.g
        total = 0.0
        entities: set[int] = set()
        for mn, en in choice.items():
            if g.removed[mn]:
                continue
            w = g.succ[mn].get(en)
            if w is not None and not g.removed[en]:
                total += w
                entities.add(en)
        for en in entities:
            for s, w in g.succ[en].items():
                if g.removed[s] or g.node_is_mention[s]:
                    continue
                if s in entities and en < s:
                    total += w
        if not entities:
            return math.nan
        return total / len(entities)

    def run_exhaustive(self) -> dict[int, int] | None:
        succ = self._actual_successors()
        combos = 1
        for s in succ.values():
            combos *= len(s)
        if combos > self.max_exhaustive:
            return None
        if combos <= 0:
            return {}
        best: dict[int, int] = {}
        # Initial best weight is Double.MIN_VALUE (4.9e-324): an
        # all-zero-weight assignment does NOT beat it (reference quirk).
        best_w = 5e-324
        mention_ids = list(succ.keys())
        for assignment in itertools.product(*(succ[m] for m in mention_ids)):
            choice = dict(zip(mention_ids, assignment))
            w = self.compute_weight(choice)
            if not math.isnan(w) and w > best_w:
                best_w = w
                best = choice
        return best

    def local_search(self, number_of_moves: int) -> dict[int, int]:
        g = self.g
        succ = self._actual_successors()
        current: dict[int, int] = {}
        combos = 1
        mention_list = list(self.mention_nodes)
        for mn in mention_list:
            cands = succ.get(mn, [])
            best_e, best_w = -1, -math.inf
            for s in cands:
                w = g.succ[mn][s]
                if w > best_w:
                    best_w, best_e = w, s
            current[mn] = best_e
            if cands:
                combos *= len(cands)
        current_w = self.compute_weight(current)
        if math.isnan(current_w):
            current_w = -math.inf
        # checkedCombinations dedups identical assignments (HashMap keys).
        checked: set[tuple[tuple[int, int], ...]] = {tuple(sorted(current.items()))}
        rng = JavaRandom(self.seed)
        if combos > 0:
            while len(checked) < number_of_moves and len(checked) < combos:
                rand_choice: dict[int, int] = {}
                for mn in mention_list:
                    cands = succ.get(mn, [])
                    if not cands:
                        continue
                    rand_choice[mn] = cands[rng.next_int(len(cands))]
                w = self.compute_weight(rand_choice)
                if not math.isnan(w) and w > current_w:
                    current_w = w
                    current = rand_choice
                checked.add(tuple(sorted(rand_choice.items())))
        return {mn: en for mn, en in current.items() if en != -1}


# ---------------------------------------------------------------- cocktail party

class _DegreeHeap:
    """Max-priority queue keyed by min weighted degree with lazy deletion."""

    def __init__(self):
        self.heap: list[tuple[float, int]] = []
        self.live: dict[int, float] = {}

    def add(self, node: int, degree: float) -> None:
        self.live[node] = degree
        heapq.heappush(self.heap, (degree, node))

    def update(self, node: int, degree: float) -> None:
        self.live[node] = degree
        heapq.heappush(self.heap, (degree, node))

    def remove(self, node: int) -> None:
        self.live.pop(node, None)

    def peek(self) -> tuple[int, float] | None:
        while self.heap:
            degree, node = self.heap[0]
            if node in self.live and self.live[node] == degree:
                return node, degree
            heapq.heappop(self.heap)
        return None

    def __bool__(self) -> bool:
        return self.peek() is not None


def cocktail_party(g: DocGraph, settings: DisambiguationSettings,
                   size_constrained: bool, seed: int,
                   skip_initial_pruning: bool = False
                   ) -> dict[int, tuple[int, float]]:
    """Run the greedy dense-subgraph algorithm on a built DocGraph.

    ``skip_initial_pruning`` is the SimpleGreedy variant
    (graph/algorithms/SimpleGreedy.java — no distance pruning).
    Returns mention_idx -> (entity_id or -1 for OOKBE, score).
    """
    gs = settings.graph
    solution: dict[int, tuple[int, float]] = {}

    # -- dangling mention removal (CocktailParty.java:411-458)
    mentions_to_remove: set[int] = set()
    for m_idx, nid in g.mention_nodes.items():
        cands = g.succ[nid]
        if not cands:
            continue
        if g.is_local_mention(nid):
            mentions_to_remove.add(nid)
            best_e, best_w = -10, -1.0
            for en, w in cands.items():
                if w > best_w:
                    best_w, best_e = w, en
            if settings.compute_confidence:
                total = sum(cands.values())
                if total > 0:
                    best_w = cands[best_e] / total
            solution[m_idx] = (g.node_data[best_e], best_w)
    entities_to_remove: set[int] = set()
    for eid, nid in g.entity_nodes.items():
        succ = g.succ[nid]
        if succ and all(s in mentions_to_remove for s in succ):
            entities_to_remove.add(nid)
    pruned = g.subgraph_without(mentions_to_remove | entities_to_remove)

    n = pruned.n_nodes
    removed = [False] * n

    # -- first scan (CocktailParty.java:1039-1082)
    mention_degrees: dict[int, int] = {}
    removable = _DegreeHeap()
    not_removable: dict[int, float] = {}
    nr_heap = _DegreeHeap()
    for nid in range(n):
        if pruned.node_is_mention[nid]:
            mention_degrees[nid] = pruned.outdegree(nid)
        else:
            wdeg = pruned.weighted_degree(nid)
            fixed = any(pruned.node_is_mention[s] and pruned.outdegree(s) == 1
                        for s in pruned.succ[nid])
            if fixed:
                not_removable[nid] = wdeg
                nr_heap.add(nid, wdeg)
            else:
                removable.add(nid, wdeg)

    initial_mention_degrees = dict(mention_degrees)
    best_mention_degrees = initial_mention_degrees
    best_removed = [False] * n
    best_removable: set[int] | None = None     # None = "live view" (java keySet view quirk)
    best_not_removable: set[int] | None = None
    snapshotted = False

    def current_objective() -> float | None:
        p1 = removable.peek()
        removable_min = p1[1] if p1 else math.inf
        p2 = nr_heap.peek()
        nr_min = p2[1] if p2 else math.inf
        mn = min(removable_min, nr_min)
        if math.isinf(mn):
            return None
        if gs.use_normalized_objective:
            size = len(removable.live)
            # java double division: x/0 == +inf
            return mn / size if size else math.inf
        return mn

    best_value = min((pruned.weighted_degree(nid) for nid in range(n)
                      if not pruned.node_is_mention[nid]), default=math.inf)

    def mark_not_removable(nid: int) -> None:
        if nid in removable.live:
            wdeg = removable.live[nid]
            removable.remove(nid)
            not_removable[nid] = wdeg
            nr_heap.add(nid, wdeg)

    def decrement_entity(nid: int, edge_w: float) -> None:
        if nid in removable.live:
            removable.update(nid, removable.live[nid] - edge_w)
        elif nid in not_removable:
            not_removable[nid] -= edge_w
            nr_heap.update(nid, not_removable[nid])

    def remove_entity_node(en: int) -> None:
        removable.remove(en)
        removed[en] = True
        for s, w in pruned.succ[en].items():
            if removed[s]:
                continue
            if pruned.node_is_mention[s]:
                mention_degrees[s] -= 1
                if mention_degrees[s] == 1:
                    for cand in pruned.succ[s]:
                        if not removed[cand]:
                            mark_not_removable(cand)
                            break
            else:
                decrement_entity(s, w)

    def snapshot() -> None:
        nonlocal best_removable, best_not_removable, best_mention_degrees
        nonlocal best_removed, snapshotted
        snapshotted = True
        best_removable = set(removable.live.keys())
        best_not_removable = set(not_removable.keys())
        best_mention_degrees = dict(mention_degrees)
        best_removed = list(removed)

    # -- initial distance-based pruning (iteration 1)
    if skip_initial_pruning:
        pass
    elif size_constrained:
        _prune_size_constrained(pruned, removed, mention_degrees, removable,
                                not_removable, nr_heap, mark_not_removable,
                                decrement_entity,
                                gs.entities_per_mention_constraint)
    else:
        diameter = 1  # getDiameter (broken in reference, always 1)
        global_avg = (pruned.avg_me + pruned.avg_ee) / 2.0
        threshold = diameter * (1.0 - global_avg) * 0.5
        _prune_by_distance(pruned, removed, mention_degrees, removable,
                           not_removable, nr_heap, mark_not_removable,
                           decrement_entity, threshold)

    no_min_removed = False
    iterations = 0
    while True:
        iterations += 1
        # find removable minimum whose removal keeps every mention covered
        target = None
        while True:
            p = removable.peek()
            if p is None:
                break
            node, _deg = p
            can_remove = not any(
                pruned.node_is_mention[s] and mention_degrees[s] == 1
                for s in pruned.succ[node])
            if can_remove:
                target = node
                break
            mark_not_removable(node)
        if target is None:
            if iterations == 1:
                no_min_removed = True
            break
        remove_entity_node(target)
        if not removable:
            break
        obj = current_objective()
        if obj is not None and obj > best_value:
            best_value = obj
            snapshot()

    if no_min_removed:
        obj = current_objective()
        if obj is not None and obj > best_value:
            best_value = obj
            snapshot()

    if not snapshotted:
        # Reference quirk: best{Removable,NotRemovable} are live keySet
        # views — if the objective never improves they reflect the FINAL
        # state, while bestRemoved stays all-false and bestMentionDegrees
        # keeps the initial degrees (CocktailParty.java:139-141,131).
        best_removable = set(removable.live.keys())
        best_not_removable = set(not_removable.keys())
        best_mention_degrees = initial_mention_degrees
        best_removed = [False] * n

    final_entities = best_removable | best_not_removable
    pruned_removed = best_removed

    extra_needed = any(d > 1 for d in best_mention_degrees.values())
    mention_nodes = list(best_mention_degrees.keys())

    graph_mapping: dict[int, int] = {}
    if not extra_needed:
        all_close: dict[int, list[float]] = {}
        for mn in mention_nodes:
            all_close[mn] = closeness(pruned, mn, pruned_removed)
        for mn in mention_nodes:
            m_idx = pruned.node_data[mn]
            if pruned.outdegree(mn) == 0:
                solution[m_idx] = (-1, 0.0)
                graph_mapping[mn] = -1
                continue
            assigned = False
            for en, w in pruned.succ[mn].items():
                if en in final_entities:
                    avg_close = 0.0
                    others = [o for o in mention_nodes if o != mn]
                    for o in others:
                        c = all_close[o][en]
                        if c != -math.inf:
                            avg_close += c
                    if others:
                        avg_close /= len(others)
                    solution[m_idx] = (pruned.node_data[en], w + avg_close)
                    graph_mapping[mn] = en
                    assigned = True
            if not assigned:
                solution[m_idx] = (-1, 0.0)
                graph_mapping[mn] = -1
    else:
        for i in range(len(pruned_removed)):
            pruned.removed[i] = pruned_removed[i]
        search = GreedyHillClimbing(pruned, mention_nodes, final_entities,
                                    settings.hill_climbing_max_exhaustive, seed)
        mapping = None
        if gs.use_exhaustive_search:
            mapping = search.run_exhaustive()
        if mapping is None:
            mapping = search.local_search(pruned.n_nodes)
        for mn in mention_nodes:
            m_idx = pruned.node_data[mn]
            en = mapping.get(mn, -1)
            graph_mapping[mn] = en
            if en != -1:
                solution[m_idx] = (pruned.node_data[en], pruned.succ[mn].get(en, 0.0))
            else:
                solution[m_idx] = (-1, 0.0)

    if settings.compute_confidence:
        # C12: replace scores with estimated confidences
        # (CocktailParty.java:387-395, createConfidenceSolution:584-610)
        from aida_ray.ned.confidence import estimate_confidence
        conf = estimate_confidence(pruned, graph_mapping, settings)
        for mn, en in graph_mapping.items():
            m_idx = pruned.node_data[mn]
            if en == -1:
                solution[m_idx] = (-1, 0.95)   # OOKBE default confidence
            else:
                solution[m_idx] = (pruned.node_data[en],
                                   conf.get(mn, {}).get(en, 0.0))

    return solution


def _entity_distance_mean(dists_by_mention: dict[int, list[float]],
                          en: int) -> float:
    finite = [d[en] for d in dists_by_mention.values() if d[en] != math.inf]
    if not finite:
        return math.nan
    return sum(finite) / len(finite)


def _prune_by_distance(g: DocGraph, removed, mention_degrees, removable,
                       not_removable, nr_heap, mark_not_removable,
                       decrement_entity, threshold: float) -> None:
    """removeInitialEntitiesByDistance (CocktailParty.java:862-934)."""
    dists = {mn: dijkstra(g, mn, removed) for mn in mention_degrees}
    to_remove: list[int] = []
    check_mention_degree: dict[int, int] = {}
    mention_max_wdeg: dict[int, float] = {}
    mention_max_entity: dict[int, int] = {}
    for nid in range(g.n_nodes):
        if removed[nid] or g.node_is_mention[nid]:
            continue
        ed = _entity_distance_mean(dists, nid)
        if not math.isnan(ed) and ed > threshold:
            for s in g.succ[nid]:
                if g.node_is_mention[s]:
                    check_mention_degree[s] = check_mention_degree.get(s, 0) + 1
                    wdeg = removable.live.get(nid, not_removable.get(nid, 0.0))
                    if s not in mention_max_wdeg or wdeg > mention_max_wdeg[s]:
                        mention_max_wdeg[s] = wdeg
                        mention_max_entity[s] = nid
            if nid not in to_remove:
                to_remove.append(nid)
    _remove_and_update(g, removed, mention_degrees, removable, not_removable,
                       nr_heap, mark_not_removable, decrement_entity,
                       to_remove, check_mention_degree, mention_max_entity,
                       mention_max_wdeg)


def _prune_size_constrained(g: DocGraph, removed, mention_degrees, removable,
                            not_removable, nr_heap, mark_not_removable,
                            decrement_entity, per_mention: int) -> None:
    """CocktailPartySizeConstrained.removeInitialEntitiesByDistance."""
    dists = {mn: dijkstra(g, mn, removed) for mn in mention_degrees}
    entity_distance: dict[int, float] = {}
    for en in list(removable.live.keys()):
        if removed[en]:
            continue
        sq = sum(d[en] ** 2 for d in dists.values() if d[en] != math.inf)
        entity_distance[en] = sq
    ordered = sorted(entity_distance.items(), key=lambda kv: (kv[1], kv[0]))
    number_to_keep = math.ceil(len(mention_degrees) * per_mention)
    to_remove: list[int] = []
    check_mention_degree: dict[int, int] = {}
    mention_max_wdeg: dict[int, float] = {}
    mention_max_entity: dict[int, int] = {}
    for i, (en, _d) in enumerate(ordered):
        if i < number_to_keep:
            continue
        to_remove.append(en)
        for s in g.succ[en]:
            if g.node_is_mention[s]:
                check_mention_degree[s] = check_mention_degree.get(s, 0) + 1
                wdeg = removable.live.get(en, 0.0)
                if s not in mention_max_wdeg or wdeg > mention_max_wdeg[s]:
                    mention_max_wdeg[s] = wdeg
                    mention_max_entity[s] = en
    _remove_and_update(g, removed, mention_degrees, removable, not_removable,
                       nr_heap, mark_not_removable, decrement_entity,
                       to_remove, check_mention_degree, mention_max_entity,
                       mention_max_wdeg)


def _remove_and_update(g: DocGraph, removed, mention_degrees, removable,
                       not_removable, nr_heap, mark_not_removable,
                       decrement_entity, to_remove: list[int],
                       check_mention_degree: dict[int, int],
                       mention_max_entity: dict[int, int],
                       mention_max_wdeg: dict[int, float]) -> None:
    """removeAndUpdateEntities (CocktailParty.java:936-1017): spare the best
    entity of any mention that would lose its whole candidate set."""
    for mn, count in check_mention_degree.items():
        if count == mention_degrees[mn]:
            keep = mention_max_entity[mn]
            if keep in to_remove:
                to_remove.remove(keep)
            mark_not_removable(keep)
    for en in to_remove:
        for s, w in g.succ[en].items():
            if g.node_is_mention[s]:
                mention_degrees[s] -= 1
            else:
                decrement_entity(s, w)
        removable.remove(en)
        removed[en] = True
