"""Offline job service (SURVEY §3.3).

Reproduces the scheduling semantics of the reference's job queue
(lib/BIGSdb/OfflineJobManager.pm):

- priority-ordered dequeue (lower number first, FIFO within priority —
  get_next_job_id :539),
- fingerprint dedup: md5 of (module, params) rejects duplicate
  submissions while an identical job is queued/running (:230),
- per-user concurrency quotas (:264, job_limits.conf),
- status lifecycle submitted -> started -> finished/failed/terminated
  with progress updates (:356 update_job_status).

State lives in a plain dict here (single driver); on a cluster the same
table is a Delta/parquet table and transitions are MERGEs — the
semantics under test are the queue rules, which are engine-independent.
"""

from __future__ import annotations

import hashlib
import itertools
import json
import threading
from dataclasses import dataclass, field


@dataclass
class Job:
    job_id: int
    module: str
    params: dict
    user: str
    priority: int
    fingerprint: str
    status: str = "submitted"
    percent_complete: int = 0
    stage: str = ""
    submit_seq: int = 0
    result: object = None


class DuplicateJobError(RuntimeError):
    pass


class QuotaExceededError(RuntimeError):
    pass


@dataclass
class JobService:
    user_quota: int = 2
    _jobs: dict[int, Job] = field(default_factory=dict)
    _seq: itertools.count = field(default_factory=itertools.count)
    # admission and dequeue are check-then-act sequences; concurrent
    # submitters (REST workers) must serialize through them or two
    # identical fingerprints could both pass the duplicate scan (the
    # reference gets this for free from the jobs DB's transaction)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    @staticmethod
    def fingerprint(module: str, params: dict) -> str:
        blob = json.dumps({"module": module, "params": params}, sort_keys=True)
        return hashlib.md5(blob.encode()).hexdigest()

    def add_job(self, module: str, params: dict, user: str, priority: int = 5) -> Job:
        fp = self.fingerprint(module, params)
        with self._lock:
            for j in self._jobs.values():
                if j.fingerprint == fp and j.status in ("submitted", "started"):
                    raise DuplicateJobError(f"duplicate of job {j.job_id}")
            active = sum(
                1
                for j in self._jobs.values()
                if j.user == user and j.status in ("submitted", "started")
            )
            if active >= self.user_quota:
                raise QuotaExceededError(f"user {user} has {active} active jobs")
            seq = next(self._seq)
            job = Job(
                job_id=seq,
                module=module,
                params=params,
                user=user,
                priority=priority,
                fingerprint=fp,
                submit_seq=seq,
            )
            self._jobs[job.job_id] = job
            return job

    def next_job(self) -> Job | None:
        """Priority-ordered dequeue, FIFO within a priority level.
        Serialized with admission so two workers cannot start the same
        job."""
        with self._lock:
            queued = [j for j in self._jobs.values() if j.status == "submitted"]
            if not queued:
                return None
            job = min(queued, key=lambda j: (j.priority, j.submit_seq))
            job.status = "started"
            return job

    def update_progress(self, job_id: int, percent: int, stage: str = "") -> None:
        j = self._jobs[job_id]
        j.percent_complete = percent
        if stage:
            j.stage = stage

    def finish(self, job_id: int, result=None, status: str = "finished") -> None:
        j = self._jobs[job_id]
        j.status = status
        j.percent_complete = 100 if status == "finished" else j.percent_complete
        j.result = result

    def run_next(self, registry: dict) -> Job | None:
        """Dequeue and execute one job inline via the analysis-operator
        registry: {module: callable(**params) -> result} — the Spark
        analogue of fork + $plugin->run_job (RunJobs.pm)."""
        job = self.next_job()
        if job is None:
            return None
        try:
            fn = registry[job.module]
            self.finish(job.job_id, result=fn(**job.params))
        except Exception as exc:  # job failure is a status, not a crash
            job.result = f"{type(exc).__name__}: {exc}"
            self.finish(job.job_id, result=job.result, status="failed")
        return job

    def all_jobs(self) -> dict[int, Job]:
        """Read-only view for monitors (the jobs-DB SELECT surface)."""
        return dict(self._jobs)

    def status(self, job_id: int) -> dict:
        j = self._jobs[job_id]
        return {
            "job_id": j.job_id,
            "status": j.status,
            "percent_complete": j.percent_complete,
            "stage": j.stage,
        }

    # -- persistence: survive a driver restart (the reference's jobs DB) --

    def save(self, path: str) -> None:
        """Persist queue state. JSON-serializable results survive the
        restart; others (e.g. DataFrames) are replaced by a
        ``result_unavailable_after_restart`` marker so a client never
        sees status 'finished' with a silently-None result."""
        state = []
        for j in self._jobs.values():
            row = {k: v for k, v in vars(j).items() if k != "result"}
            try:
                json.dumps(j.result)
                row["result"] = j.result
            except (TypeError, ValueError):
                if j.result is not None:
                    row["result"] = {"result_unavailable_after_restart": True}
                else:
                    row["result"] = None
            state.append(row)
        with open(path, "w") as fh:
            json.dump(state, fh)

    @classmethod
    def load(cls, path: str, user_quota: int = 2) -> "JobService":
        svc = cls(user_quota=user_quota)
        with open(path) as fh:
            state = json.load(fh)
        for row in state:
            job = Job(**row)
            # a job that was mid-flight when the driver died goes back to
            # the queue (the reference's crashed-job requeue behaviour)
            if job.status == "started":
                job.status = "submitted"
            svc._jobs[job.job_id] = job
        if state:
            svc._seq = itertools.count(max(j["job_id"] for j in state) + 1)
        return svc
