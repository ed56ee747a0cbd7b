"""Per-origin politeness: token-bucket actors over virtual time.

The reference serializes requests per coarsened origin and sleeps a
per-origin interval after each request (reference:
src/lib/throttled-queue.js:110-128; intervals
src/lib/specs-crawler.js:460-472: 2000 ms csswg.org, 1000 ms
www.w3.org, 100 ms default, 0 when --use-crawl).

Here the budget is enforced by one OriginGate actor per origin-hash
shard. Time is *virtual* by default: a crawl round spans
``round_ms`` of budget per origin, so an origin with interval I admits
⌈round_ms / I⌉ URLs per round and defers the rest to the next round
(counted ``deferred_politeness``, per the north_rule lineage metrics).
This reproduces the reference's budget accounting deterministically
without wall-clock sleeping — the synthetic fetch has no real server
to protect (the reference itself drops to sleep=0 in --use-crawl
mode). Set ``real_sleep=True`` to actually pace requests.

Hot-host skew salting: callers may split one hot origin's queue across
K salted shards; all salted shards route to the SAME gate actor, so
the shared rate budget holds while the fetch/parse work for admitted
URLs fans out across the cluster (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import math
import time

import ray

from ..urlnorm import sleep_interval_ms


# num_cpus=0: coordination actor (token bookkeeping only).
@ray.remote(num_cpus=0)
class OriginGate:
    """Token bucket for one (or a hash-shard of) coarse origin(s)."""

    def __init__(self, real_sleep: bool = False):
        self.real_sleep = real_sleep
        self.deferred = 0
        self.admitted = 0
        # virtual clock per origin: ms of budget consumed in current round
        self._round_used: dict[str, float] = {}

    def begin_round(self) -> None:
        self._round_used = {}

    def admit(self, origin: str, n: int, round_ms: float) -> int:
        """Admit up to the origin's remaining budget this round.

        Returns k (first k of the caller's priority-ordered URLs are
        admitted; the rest must be deferred to the next round).
        """
        interval = max(sleep_interval_ms(origin), 1)
        used = self._round_used.get(origin, 0.0)
        budget = max(0.0, round_ms - used)
        if math.isinf(budget):  # politeness effectively off (useCrawl mode)
            k = n
        else:
            k = min(n, max(0, math.ceil(budget / interval)))
        self._round_used[origin] = used + k * interval
        self.admitted += k
        self.deferred += n - k
        if self.real_sleep and k:
            time.sleep(k * interval / 1000.0)
        return k

    def stats(self) -> dict:
        return {"admitted": self.admitted, "deferred": self.deferred}


class PolitenessGates:
    """Driver-side pool of gate actors, one per origin-hash shard."""

    def __init__(self, num_gates: int = 8, real_sleep: bool = False):
        from ..urlnorm import fnv1a64

        self._hash = fnv1a64
        self.num_gates = num_gates
        self.gates = [OriginGate.remote(real_sleep) for _ in range(num_gates)]

    def gate_for(self, origin: str):
        return self.gates[self._hash(origin) % self.num_gates]

    def begin_round(self) -> None:
        ray.get([g.begin_round.remote() for g in self.gates])

    def stats(self) -> dict:
        s = ray.get([g.stats.remote() for g in self.gates])
        return {
            "admitted": sum(x["admitted"] for x in s),
            "deferred": sum(x["deferred"] for x in s),
        }
