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
    """

    def __init__(self, budget_bytes: int = 0):
        self.budget_bytes = int(budget_bytes)
        self.reserved_bytes = 0
        self._exhausted_logged = False

    @classmethod
    def from_config(cls, cfg) -> "CacheBudget":
        gb = float(getattr(cfg.tpu, "cache_budget_gb", 0.0) or 0.0)
        return cls(int(gb * (1 << 30)))

    def try_reserve(self, nbytes: int, what: str = "batch") -> bool:
        if self.budget_bytes <= 0:
            return True
        if self.reserved_bytes + nbytes <= self.budget_bytes:
            self.reserved_bytes += nbytes
            return True
        if not self._exhausted_logged:
            print(
                f"[cache] tpu.cache_budget_gb exhausted at "
                f"{self.reserved_bytes / 2**30:.2f} GiB "
                f"(budget {self.budget_bytes / 2**30:.2f} GiB) — "
                f"further {what}s stream host->device every epoch",
                flush=True,
            )
            self._exhausted_logged = True
        return False


def arrays_nbytes(arrays: dict) -> int:
    """Total bytes of a batch-arrays dict (numpy or jax arrays)."""
    return sum(int(v.nbytes) for v in arrays.values())
