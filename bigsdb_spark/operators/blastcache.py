"""BLAST database cache lifecycle — the per-(db, loci-hash) naming and
staleness contract of the reference's offline BLAST runner
(lib/BIGSdb/Offline/Blast.pm).

This is the driver-side adapter boundary around ``ExternalTool``
(operators/seqmatch.py): the cached artifact is a makeblastdb directory
on the node that runs the external binary, NOT distributed data — so
this module is deliberately plain-filesystem Python.  What it pins:

- cache NAME = optional ``EX`` exemplar prefix + md5 of the
  comma-joined loci list (``_get_cache_name``, Blast.pm:884-890), so a
  query against any loci subset maps deterministically to one cache;
- cache DIR  = ``<root>/<db>/<name>`` (``_get_cache_dir``,
  Blast.pm:793-805) holding ``sequences.fas`` + a ``loci`` manifest
  (one locus per line, ``_get_cache_loci`` / Blast.pm:160-180 reads it
  to find caches containing a locus);
- STALENESS  = a ``stale`` flag file, an empty ``sequences.fas``, or
  age beyond ``cache_days`` (``_delete_cache_if_stale``,
  Blast.pm:814-824); ``exists()`` deletes-if-stale before answering
  (``_cache_exists``, Blast.pm:806-812);
- INVALIDATION = ``mark_all_stale`` / ``mark_locus_stale`` write the
  flag file (Blast.pm:131-154) — marking is cheap and safe while a
  query is running; the delete happens lazily at the next existence
  check;
- DELETE refuses while a ``LOCK`` file exists (Blast.pm:861-866); the
  reference's READ_* in-flight markers and flock are process-level
  concerns of the live binary and are out of scope here (documented,
  not modeled).

``clock`` is injectable so the age policy is testable without
sleeping.  The batched multi-query outfmt-6 parse this cache fronts is
fixture-pinned in tests/test_blast_contract.py.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
from collections.abc import Callable


class BlastCacheManager:
    def __init__(
        self,
        root: str,
        db: str,
        cache_days: float = 7.0,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.dir = os.path.join(root, db)
        self.cache_days = cache_days
        self.clock = clock

    # -- naming (Blast.pm:884-890) --------------------------------------
    def cache_name(self, loci: list[str], exemplar: bool = False) -> str:
        prefix = "EX" if exemplar else ""
        digest = hashlib.md5(",".join(loci).encode("utf-8")).hexdigest()
        return prefix + digest

    def cache_dir(self, name: str) -> str:
        return os.path.join(self.dir, name)

    # -- creation --------------------------------------------------------
    def create(self, name: str, loci: list[str], fasta_text: str) -> str:
        """Write the cache directory: the FASTA the external
        makeblastdb would index, plus the loci manifest."""
        path = self.cache_dir(name)
        os.makedirs(path, exist_ok=True)
        fasta = os.path.join(path, "sequences.fas")
        with open(fasta, "w") as fh:
            fh.write(fasta_text)
        # stamp the mtime from the injected clock so the age policy
        # (reference: -M sequences.fas) follows it in tests
        t = self.clock()
        os.utime(fasta, (t, t))
        with open(os.path.join(path, "loci"), "w") as fh:
            fh.write("\n".join(loci) + "\n")
        return path

    # -- introspection ---------------------------------------------------
    def cache_names(self) -> list[str]:
        """Every cache dir under this db (``_get_cache_names``,
        Blast.pm:78-92)."""
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            n
            for n in os.listdir(self.dir)
            if not n.startswith(".")
            and os.path.isdir(os.path.join(self.dir, n))
        )

    def cache_loci(self, name: str) -> list[str]:
        manifest = os.path.join(self.cache_dir(name), "loci")
        if not os.path.exists(manifest):
            return []
        with open(manifest) as fh:
            return [line.strip() for line in fh if line.strip()]

    def caches_containing_locus(self, locus: str) -> list[str]:
        """(Blast.pm:155-180)"""
        return [n for n in self.cache_names() if locus in self.cache_loci(n)]

    # -- staleness (Blast.pm:806-831) -------------------------------------
    def _age_days(self, name: str) -> float:
        fasta = os.path.join(self.cache_dir(name), "sequences.fas")
        if not os.path.exists(fasta):
            return 0.0
        return (self.clock() - os.stat(fasta).st_mtime) / 86400.0

    def is_stale(self, name: str) -> bool:
        path = self.cache_dir(name)
        fasta = os.path.join(path, "sequences.fas")
        flagged = os.path.exists(os.path.join(path, "stale"))
        empty = not os.path.exists(fasta) or os.path.getsize(fasta) == 0
        return flagged or empty or self._age_days(name) > self.cache_days

    def delete_if_stale(self, name: str) -> bool:
        if self.is_stale(name):
            return self.delete(name)
        return False

    def exists(self, name: str) -> bool:
        """True only for a present, non-stale cache; a stale one is
        deleted on the way (``_cache_exists``)."""
        if not os.path.exists(self.cache_dir(name)):
            return False
        if self.delete_if_stale(name):
            return False
        return True

    # -- invalidation (Blast.pm:131-154) ----------------------------------
    def _flag(self, name: str) -> None:
        open(os.path.join(self.cache_dir(name), "stale"), "w").close()

    def mark_all_stale(self) -> None:
        for name in self.cache_names():
            self._flag(name)

    def mark_locus_stale(self, locus: str) -> None:
        for name in self.caches_containing_locus(locus):
            self._flag(name)

    # -- deletion (Blast.pm:850-882) ---------------------------------------
    def delete(self, name: str) -> bool:
        path = self.cache_dir(name)
        if os.path.exists(os.path.join(path, "LOCK")):
            return False  # query building the cache right now
        shutil.rmtree(path, ignore_errors=True)
        # The success flag must reflect actual removal: rmtree with
        # ignore_errors can fail silently (e.g. EACCES), leaving a stale
        # dir that exists() would then misreport and refresh() would
        # makedirs over.
        return not os.path.exists(path)

    def refresh(
        self,
        rebuild: Callable[[str, list[str]], str],
    ) -> list[str]:
        """Recreate every stale/old cache (``refresh_caches``,
        Blast.pm:913-940): the loci manifest is read FIRST (the delete
        removes it), then ``rebuild(name, loci)`` supplies the new
        FASTA text.  Returns the rebuilt names."""
        rebuilt = []
        for name in self.cache_names():
            loci = self.cache_loci(name)
            if not self.exists(name):  # deletes if stale
                self.create(name, loci, rebuild(name, loci))
                rebuilt.append(name)
        return rebuilt
