"""REST submission routes (SURVEY §3.4): the reference's submission
API surface over the batch validation operators.

Reference behavior (WHAT): ``lib/BIGSdb/REST/Routes/Submissions.pm``
- :29-43 the route table — GET/POST /submissions, GET/DELETE
  /submissions/:id, GET/POST …/messages, GET/POST …/files,
  GET/DELETE …/files/:file;
- :72-117 ``_get_submissions`` — the caller's submissions, optional
  ``type`` (validated per db type, :46-60) and ``status``
  (pending|closed else 400) filters, id-ordered with the standard
  paging envelope;
- :255-322 ``_create_submission`` — type check, daily quota (429,
  :227-253, Constants.pm:317 DAILY_REST_LIMIT=50), per-type payload
  preparation (:339-397 alleles with SEQ_METHODS / read-length /
  coverage rules, :428-485 profiles, :486-542 isolates), the opening
  correspondence message, 201 + submission URI;
- :134-191 ``_get_submission`` — core fields, per-type detail, full
  correspondence; owner check :119-125 (403);
- :215-225 ``_delete_submission`` — owner-only, pending blocked (403);
- :544-595 messages, :597-667 supporting files with the
  filename-traversal guard :127-132.

HOW here: submissions are control-plane metadata (one row per
submission, download-sized payloads), so the STORE is a plain
in-process dataclass registry like ``jobs.JobService`` — on a cluster
the same tables are Delta/parquet and every transition a MERGE.  The
VALIDATION is the data-plane part and runs through the distributed
batch operators (``operators/submissions.check_new_alleles`` /
``check_new_profiles``) exactly as the curation gate does, so a
submission of a million alleles validates as one Spark plan, not a
per-sequence loop.
"""

from __future__ import annotations

import base64
import itertools
import os
import re
from dataclasses import dataclass, field

from bigsdb_spark.plans.rest import BadRequest, NotFound, paging_links

__all__ = [
    "Forbidden",
    "TooManyRequests",
    "SubmissionStore",
    "route_submissions_list",
    "route_submission_create",
    "route_submission_record",
    "route_submission_delete",
    "route_submission_messages",
    "route_submission_add_message",
    "route_submission_files",
    "route_submission_upload_file",
    "route_submission_get_file",
    "route_submission_delete_file",
]


class Forbidden(ValueError):
    """Maps to HTTP 403 — not the submission owner, or deleting a
    pending submission (Submissions.pm:119-125, :220)."""


class TooManyRequests(ValueError):
    """Maps to HTTP 429 — the daily submission quota
    (Submissions.pm:227-244)."""


# Constants.pm:50-56 / :311-317 — the closed vocabularies the create
# route validates against (public reference metadata, not code).
SEQ_METHODS = (
    "454", "DNBSEQ", "Illumina", "Illumina + ONT hybrid",
    "Illumina + PacBio hybrid", "Ion Torrent", "Oxford Nanopore",
    "PacBio", "Sanger", "Solexa", "SOLiD", "other", "unknown",
)
COVERAGE = ("<20x", "20-49x", "50-99x", ">100x")
READ_LENGTH = ("<100", "100-199", "200-299", "300-499", ">500")
REQUIRES_READ_LENGTH = ("Illumina",)
REQUIRES_COVERAGE = ("Illumina",)
DAILY_REST_LIMIT = 50

_DB_TYPES = {
    "sequences": {"alleles", "profiles"},
    "isolates": {"isolates", "genomes"},
}


@dataclass
class Submission:
    id: str
    type: str
    submitter: str
    date_submitted: str
    datestamp: str
    status: str = "pending"  # pending | closed
    outcome: str | None = None
    curator: str | None = None
    detail: dict = field(default_factory=dict)  # per-type payload
    messages: list[dict] = field(default_factory=list)


@dataclass
class SubmissionStore:
    """In-process submission registry + supporting-files directory.

    ``files_dir`` holds each submission's supporting files under
    ``<files_dir>/<submission_id>/supporting_files`` — the same layout
    the reference's SubmissionHandler uses for its submission dirs."""

    files_dir: str
    db_type: str = "sequences"
    daily_limit: int = DAILY_REST_LIMIT
    _subs: dict[str, Submission] = field(default_factory=dict)
    _seq: itertools.count = field(default_factory=lambda: itertools.count(1))

    def new_id(self, today: str) -> str:
        # reference ids are BIGSdb_<timestamp>_<pid>_<rand>; a
        # deterministic sequence keeps the same shape testable
        n = next(self._seq)
        return f"BIGSdb_{today.replace('-', '')}_{n:06d}"

    def pending_today(self, user: str, today: str) -> int:
        return sum(
            1
            for s in self._subs.values()
            if s.submitter == user
            and s.status == "pending"
            and s.date_submitted == today
        )

    def add(self, sub: Submission) -> None:
        self._subs[sub.id] = sub

    def get(self, sid: str) -> Submission | None:
        return self._subs.get(sid)

    def delete(self, sid: str) -> None:
        self._subs.pop(sid, None)
        import shutil

        shutil.rmtree(self.sub_dir(sid), ignore_errors=True)

    def all(self) -> list[Submission]:
        return [self._subs[k] for k in sorted(self._subs)]

    def sub_dir(self, sid: str) -> str:
        return os.path.join(self.files_dir, sid, "supporting_files")


def _check_db_type(store: SubmissionStore, type_: str | None) -> None:
    """Submissions.pm:46-60 — type required and supported by this
    database flavor (unsupported is the reference's 404)."""
    if not type_:
        raise BadRequest("Submission type not selected")
    if type_ not in _DB_TYPES.get(store.db_type, set()):
        raise NotFound(
            f'Submissions of type "{type_}" are not supported by this database'
        )


def _get_owned(store: SubmissionStore, user: str, sid: str) -> Submission:
    sub = store.get(sid)
    if sub is None:
        raise NotFound("Submission does not exist.")
    if sub.submitter != user:
        raise Forbidden("You are not the owner of this submission.")
    return sub


def _check_filename(filename: str) -> None:
    """Submissions.pm:127-132 — no path separators or traversal."""
    if re.search(r"[/\\]", filename) or ".." in filename:
        raise BadRequest("Filename contains invalid characters.")


def route_submissions_list(
    store: SubmissionStore,
    user: str,
    base: str,
    type: str | None = None,
    status: str | None = None,
    page: int = 1,
    page_size: int = 25,
) -> dict:
    """GET /db/:db/submissions (Submissions.pm:72-117): the caller's
    submissions id-ordered, paged, as record URIs."""
    if type is not None:
        _check_db_type(store, type)
    if status is not None and status not in ("pending", "closed"):
        raise BadRequest(
            'Invalid status value - use either "pending" or "closed".'
        )
    mine = [
        s
        for s in store.all()
        if s.submitter == user
        and (type is None or s.type == type)
        and (status is None or s.status == status)
    ]
    total = len(mine)
    page_rows = mine[(page - 1) * page_size : page * page_size]
    values: dict = {"records": total}
    paging = paging_links(page, page_size, total)
    if total:
        values["paging"] = paging
    values["submissions"] = [
        f"{base}/submissions/{s.id}" for s in page_rows
    ]
    return values


def _parse_fasta_string(fasta: str) -> list[tuple[str, str]]:
    """Submissions.pm:402-407: strip leading blanks, allow a bare
    (headerless) sequence as ``>seq``."""
    text = fasta.lstrip()
    if not text.startswith(">"):
        text = ">seq\n" + text
    out: list[tuple[str, str]] = []
    sid, chunks = None, []
    for line in text.splitlines():
        if line.startswith(">"):
            if sid is not None:
                out.append((sid, "".join(chunks)))
            sid, chunks = line[1:].split()[0] if line[1:].split() else "", []
        else:
            chunks.append(line.strip())
    if sid is not None:
        out.append((sid, "".join(chunks)))
    return out


def _prepare_alleles(spark, body: dict, existing, locus_exists) -> dict:
    """Submissions.pm:339-426 — required fields, SEQ_METHODS and
    read-length/coverage vocabularies, then the batch FASTA check with
    info tiers skipped (skip_info_checks, :408); any sequence error is
    the route's 400."""
    required = ("locus", "technology", "assembly", "software", "sequences")
    missing = sorted(f for f in required if body.get(f) is None)
    if missing:
        raise BadRequest(f"Required field(s) missing: {', '.join(missing)}")
    locus = body["locus"]
    if not locus_exists(locus):
        raise BadRequest(f"Invalid value for locus: {locus}")
    tech = body["technology"]
    if tech not in SEQ_METHODS:
        raise BadRequest(
            f"Invalid value for technology: {tech}. "
            f"Allowed values are: {', '.join(SEQ_METHODS)}"
        )
    for fname, requires, allowed in (
        ("read_length", REQUIRES_READ_LENGTH, READ_LENGTH),
        ("coverage", REQUIRES_COVERAGE, COVERAGE),
    ):
        v = body.get(fname)
        if v is None and tech in requires:
            raise BadRequest(f"{fname} must be provided for {tech} sequences.")
        if v is None:
            continue
        ok_int = isinstance(v, int) and not isinstance(v, bool) and v > 0
        if v not in allowed and not ok_int:
            raise BadRequest(
                f"Invalid value for {fname}: {v}. Allowed values are: "
                f"{', '.join(allowed)} or any positive integer."
            )
    from bigsdb_spark.operators.submissions import check_new_alleles

    pairs = _parse_fasta_string(body["sequences"])
    if not pairs:
        raise BadRequest("No sequences in upload.")
    seqs = spark.createDataFrame(pairs, "seq_id string, sequence string")
    checked = check_new_alleles(
        seqs, existing, locus, check_similarity=False
    ).collect()
    errs = [e for r in checked for e in r["errors"]]
    if errs:
        raise BadRequest(" ".join(errs))
    return {
        "locus": locus,
        "technology": tech,
        "read_length": body.get("read_length"),
        "coverage": body.get("coverage"),
        "assembly_method": body.get("assembly"),
        "software": body.get("software"),
        "comments": body.get("comments"),
        "seqs": [
            {
                "seq_id": r["seq_id"],
                "sequence": r["sequence"],
                "status": "pending",
                "assigned_id": None,
            }
            for r in checked
        ],
    }


def _prepare_profiles(
    spark, body: dict, scheme_loci, existing_alleles, existing_profiles
) -> dict:
    """Submissions.pm:428-485 — scheme_id integer check, then the
    batch profile-table check; any row error is the route's 400."""
    missing = sorted(
        f for f in ("scheme_id", "profiles") if body.get(f) is None
    )
    if missing:
        raise BadRequest(f"Required field(s) missing: {', '.join(missing)}")
    scheme_id = body["scheme_id"]
    if isinstance(scheme_id, bool) or not isinstance(scheme_id, int):
        raise BadRequest("Scheme id must be an integer")
    from bigsdb_spark.operators.submissions import check_new_profiles

    rows = body["profiles"]  # [(row_id, locus, allele_id)] long form
    if not rows:
        raise BadRequest("No profiles in upload.")
    checked = check_new_profiles(
        spark.createDataFrame(
            rows, "row_id string, locus string, allele_id string"
        ),
        scheme_loci,
        existing_alleles,
        existing_profiles,
    ).collect()
    errs = [e for r in checked for e in r["errors"]]
    if errs:
        raise BadRequest(" ".join(errs))
    return {
        "scheme_id": scheme_id,
        "profiles": [
            {
                "profile_id": r["row_id"],
                "designations": list(r["profile"]),
                "status": "pending",
                "assigned_id": None,
            }
            for r in checked
        ],
    }


def route_submission_create(
    store: SubmissionStore,
    user: str,
    base: str,
    body: dict,
    today: str,
    spark=None,
    existing_alleles=None,
    existing_profiles=None,
    scheme_loci: list[str] | None = None,
    locus_exists=None,
    client_name: str = "REST client",
) -> dict:
    """POST /db/:db/submissions (Submissions.pm:255-322): validate the
    per-type payload through the batch operators, register the
    submission with its opening correspondence message, return the 201
    envelope.  ``today`` is injected (no wall-clock in the plan layer;
    the reference stamps 'now' server-side)."""
    type_ = body.get("type")
    _check_db_type(store, type_)
    if store.pending_today(user, today) >= store.daily_limit:
        raise TooManyRequests(
            "You have made too many separate submissions today - please "
            "try again tomorrow. A quota is in place to prevent "
            "misbehaving scripts flooding the submission system."
        )
    if type_ == "alleles":
        detail = _prepare_alleles(
            spark, body, existing_alleles, locus_exists or (lambda l: True)
        )
    elif type_ == "profiles":
        detail = _prepare_profiles(
            spark, body, scheme_loci or [], existing_alleles, existing_profiles
        )
    else:  # isolates / genomes: field table captured verbatim; the
        # registry validation path (registry.validation_errors) is the
        # curation-side gate, as in the reference's check_new_isolates
        isolates = body.get("isolates")
        if isolates is None:
            raise BadRequest("Required field(s) missing: isolates")
        detail = {"isolates": isolates}
    sid = store.new_id(today)
    msg = f"Submission via REST interface (client: {client_name})."
    if body.get("message"):
        msg += "\n" + str(body["message"])
    sub = Submission(
        id=sid,
        type=type_,
        submitter=user,
        date_submitted=today,
        datestamp=today,
        detail=detail,
        messages=[{"user_id": user, "timestamp": today, "message": msg}],
    )
    store.add(sub)
    os.makedirs(store.sub_dir(sid), exist_ok=True)
    return {"submission": f"{base}/submissions/{sid}"}


def route_submission_record(
    store: SubmissionStore, user: str, sid: str, base: str
) -> dict:
    """GET /db/:db/submissions/:id (Submissions.pm:134-191): core
    fields, per-type detail, correspondence."""
    sub = _get_owned(store, user, sid)
    values: dict = {
        "id": sub.id,
        "type": sub.type,
        "date_submitted": sub.date_submitted,
        "datestamp": sub.datestamp,
        "status": sub.status,
        "submitter": f"{base}/users/{sub.submitter}",
    }
    if sub.outcome:
        values["outcome"] = sub.outcome
    if sub.curator:
        values["curator"] = f"{base}/users/{sub.curator}"
    for k, v in sub.detail.items():
        if v is not None:
            values[k] = v
    if sub.type == "profiles" and "scheme_id" in sub.detail:
        values["scheme"] = f"{base}/schemes/{sub.detail['scheme_id']}"
        values.pop("scheme_id", None)
    if sub.messages:
        values["correspondence"] = [
            {
                "user": f"{base}/users/{m['user_id']}",
                "timestamp": m["timestamp"],
                "message": m["message"],
            }
            for m in sub.messages
        ]
    return values


def route_submission_delete(
    store: SubmissionStore, user: str, sid: str
) -> dict:
    """DELETE /db/:db/submissions/:id (Submissions.pm:215-225):
    owner-only; pending submissions cannot be deleted."""
    sub = _get_owned(store, user, sid)
    if sub.status == "pending":
        raise Forbidden("You cannot delete a pending submission.")
    store.delete(sid)
    return {"message": "Submission deleted."}


def route_submission_messages(
    store: SubmissionStore, user: str, sid: str, base: str
) -> list[dict]:
    """GET …/messages (Submissions.pm:544-577)."""
    sub = _get_owned(store, user, sid)
    return [
        {
            "user": f"{base}/users/{m['user_id']}",
            "timestamp": m["timestamp"],
            "message": m["message"],
        }
        for m in sub.messages
    ]


def route_submission_add_message(
    store: SubmissionStore, user: str, sid: str, message: str, today: str
) -> dict:
    """POST …/messages (Submissions.pm:579-604)."""
    sub = _get_owned(store, user, sid)
    if not message:
        raise BadRequest("No message included.")
    sub.messages.append(
        {"user_id": user, "timestamp": today, "message": message}
    )
    return {"message": "Message added."}


def route_submission_files(
    store: SubmissionStore, user: str, sid: str, base: str
) -> list[str]:
    """GET …/files (Submissions.pm:625-647): sorted file URIs."""
    _get_owned(store, user, sid)
    d = store.sub_dir(sid)
    names = sorted(os.listdir(d)) if os.path.isdir(d) else []
    return [
        f"{base}/submissions/{sid}/files/{n}"
        for n in names
        if not n.startswith(".")
    ]


def route_submission_upload_file(
    store: SubmissionStore,
    user: str,
    sid: str,
    filename: str,
    upload_b64: str,
) -> dict:
    """POST …/files (Submissions.pm:597-623): base64 payload, no
    overwrite, traversal-guarded filename."""
    _get_owned(store, user, sid)
    if not filename:
        raise BadRequest("Filename is required.")
    _check_filename(filename)
    if not upload_b64:
        raise BadRequest("No data in upload.")
    d = store.sub_dir(sid)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, filename)
    if os.path.exists(path):
        raise BadRequest(f"File {filename} is already uploaded.")
    try:
        # MIME-style uploads wrap lines: strip whitespace, then
        # validate the alphabet (the reference's decode_base64 also
        # ignores line breaks)
        payload = base64.b64decode(
            re.sub(r"\s+", "", upload_b64), validate=True
        )
    except Exception:
        raise BadRequest("Upload is not valid base64.") from None
    with open(path, "wb") as fh:
        fh.write(payload)
    return {"message": "File uploaded."}


def route_submission_get_file(
    store: SubmissionStore, user: str, sid: str, filename: str
) -> bytes:
    """GET …/files/:file (Submissions.pm:649-665)."""
    _get_owned(store, user, sid)
    _check_filename(filename)
    path = os.path.join(store.sub_dir(sid), filename)
    if not os.path.exists(path):
        raise NotFound("File does not exist.")
    with open(path, "rb") as fh:
        return fh.read()


def route_submission_delete_file(
    store: SubmissionStore, user: str, sid: str, filename: str
) -> dict:
    """DELETE …/files/:file (Submissions.pm:667-684)."""
    _get_owned(store, user, sid)
    _check_filename(filename)
    path = os.path.join(store.sub_dir(sid), filename)
    if not os.path.exists(path):
        raise NotFound("File does not exist.")
    os.remove(path)
    return {"message": "File deleted."}
