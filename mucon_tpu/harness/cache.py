"""Device-cache byte budget shared by the trainer and its evaluators.

The device-resident batch cache (``tpu.cache_batches``) trades HBM for
zero host->device traffic after epoch 1.  At Breakfast scale (~1.7k
videos x ~1.7k frames x 2048-d) the full feature set approaches a single
chip's HBM, so the cache takes a byte budget (``tpu.cache_budget_gb``):
batches are cached first-come-first-served until the budget is spent and
later batches stream every epoch.  The trainer fills the budget first
(its loop is the hot one); evaluators share the trainer's budget object
so periodic evals degrade to streaming instead of OOMing the chip.

No reference equivalent — the reference streams one video at a time
through a pinned-memory DataLoader (src/mucon/trainers.py:97-105).
"""

from __future__ import annotations


class CacheBudget:
    """First-come-first-served byte reservation for device batch caches.

    ``budget_bytes <= 0`` means unlimited (the historical behavior).

    ``eval_reserve_bytes`` carves out a slice the TRAIN pool may not
    consume, so the (small, replayed-every-eval) eval set still caches
    when the train set alone exceeds the budget.  Measured motivation
    (docs/TIMED_RUN.md round 3): with the train cache filling an 11 GiB
    budget FCFS, the 5 periodic evals re-streamed the test features over
    the ~150 MB/s tunnel every time — 620 s of a 2546 s run.  The eval
    pool may also use any unreserved leftovers; without the knob the
    behavior is exactly the old FCFS.
    """

    def __init__(self, budget_bytes: int = 0, eval_reserve_bytes: int = 0):
        self.budget_bytes = int(budget_bytes)
        self.eval_reserve_bytes = int(eval_reserve_bytes)
        self.reserved_train = 0
        self.reserved_eval = 0
        self._exhausted_logged = set()

    @property
    def reserved_bytes(self) -> int:
        return self.reserved_train + self.reserved_eval

    @classmethod
    def from_config(cls, cfg) -> "CacheBudget":
        gb = float(getattr(cfg.tpu, "cache_budget_gb", 0.0) or 0.0)
        ev = float(getattr(cfg.tpu, "cache_budget_eval_gb", 0.0) or 0.0)
        return cls(int(gb * (1 << 30)), int(ev * (1 << 30)))

    def try_reserve(
        self, nbytes: int, what: str = "batch", pool: str = "train"
    ) -> bool:
        if self.budget_bytes <= 0:
            return True
        if pool == "eval":
            # eval may use its reserve AND any space train hasn't taken
            fits = self.reserved_bytes + nbytes <= self.budget_bytes
        else:
            # train must leave the eval reserve untouched (counting what
            # eval has already used against the reserve, not twice)
            headroom = max(self.eval_reserve_bytes - self.reserved_eval, 0)
            fits = (
                self.reserved_bytes + nbytes + headroom <= self.budget_bytes
            )
        if fits:
            if pool == "eval":
                self.reserved_eval += nbytes
            else:
                self.reserved_train += nbytes
            return True
        if pool not in self._exhausted_logged:
            print(
                f"[cache] tpu.cache_budget_gb exhausted for {pool} at "
                f"{self.reserved_bytes / 2**30:.2f} GiB "
                f"(budget {self.budget_bytes / 2**30:.2f} GiB, eval "
                f"reserve {self.eval_reserve_bytes / 2**30:.2f}) — "
                f"further {what}s stream host->device every epoch",
                flush=True,
            )
            self._exhausted_logged.add(pool)
        return False


def arrays_nbytes(arrays: dict) -> int:
    """Total bytes of a batch-arrays dict (numpy or jax arrays)."""
    return sum(int(v.nbytes) for v in arrays.values())
