"""Leader election and membership on the commit plane (SURVEY §2 D8).

Reference parity: the coordinator role the reference fills with
ZooKeeper — ephemeral-node registration and the ``getServers`` election
flow (``DistributedManager.java:144-239``), the ``electMaster`` rule
(``DistributedManager.java:292-318``: candidates of type
MASTER/SLAVE/ONLINE → keep max ``dataVersion`` → first created wins;
a lone ONLINE candidate is held back until an election delay elapses),
and the server-type lattice (``DistributedServer.java:1177-1192``).

This is deliberately NOT a consensus protocol: like the reference, it
delegates the hard part to a storage medium with a conditional-create
primitive.  ZooKeeper analog on the six :class:`~adfs_spark.backend.
CommitBackend` verbs:

- **ephemeral node** → member key whose ``mtime`` must stay within
  ``member_ttl`` (heartbeat = ``replace``; missed heartbeats = session
  expiry, the member drops out of every snapshot)
- **czxid creation order** → a monotonic ``seq`` reserved with
  ``put_if_absent`` at first registration; the first-created tiebreak
  survives re-registration because ``seq``/``created`` are carried
  forward
- **synchronized master claim** → a fenced lease: the election rule is
  deterministic over the membership snapshot, and the winner must
  additionally claim the ``leader`` key via ``put_if_absent`` carrying
  ``epoch + 1`` — the fencing token downstream writers guard with.  A
  crashed master's lease ages out by ``mtime`` and is stolen exactly
  like a commit lock (``storage.py::_reserve_commit``); the epoch
  high-water mark is persisted so tokens stay monotonic across steals.

The known delete/recreate steal race (two stealers both observe a stale
lease) is resolved the same way as the commit-lock steal: both delete,
exactly one ``put_if_absent`` succeeds, and the loser's view is
corrected on its next :meth:`ElectionGroup.leader` read.  The fencing
epoch makes any transiently-double observation detectable: a writer
holding epoch *e* is fenced by any state stamped with *e' > e*.
"""

from __future__ import annotations

import json
import posixpath
import time
from dataclasses import dataclass


class ServerType:
    """Server-type lattice (``DistributedServer.java:1177-1192``)."""

    MASTER = "MASTER"
    SLAVE = "SLAVE"
    UNDER_RESTORE = "UNDER_RESTORE"
    NEED_RESTORE = "NEED_RESTORE"
    ONLINE = "ONLINE"
    STANDBY = "STANDBY"
    STOP = "STOP"

    #: types eligible to stand in an election (``electMaster`` pulls
    #: MASTER/SLAVE/ONLINE, DistributedManager.java:294-295)
    ELECTABLE = frozenset({MASTER, SLAVE, ONLINE})
    #: types a new master re-stamps to NEED_RESTORE (``getServers``
    #: touches everything not STANDBY/STOP, DistributedManager.java:168)
    RESTAMPED = frozenset(
        {MASTER, SLAVE, UNDER_RESTORE, NEED_RESTORE, ONLINE}
    )


@dataclass(frozen=True)
class ServerStatus:
    """One member's registration — the parsed ephemeral-node payload
    (``DistributedManager.java:getServerStatus``)."""

    name: str
    version: int
    type: str
    setter: str | None
    seq: int
    created: float
    mtime: float
    alive: bool


def _elect(candidates: list[ServerStatus]) -> ServerStatus | None:
    """The deterministic rule from ``electMaster``: max dataVersion,
    then first created (czxid order → our registration ``seq``), then
    name as a total-order tiebreak the reference gets for free from
    ZooKeeper's single sequencer."""
    if not candidates:
        return None
    vmax = max(c.version for c in candidates)
    pool = [c for c in candidates if c.version == vmax]
    return min(pool, key=lambda c: (c.seq, c.name))


class ElectionGroup:
    """Membership + leader election for one logical service.

    All state lives under ``root`` in a :class:`CommitBackend`:
    ``members/<name>`` (JSON payload, mtime = heartbeat),
    ``seq/<n>`` (creation-order reservations), ``leader`` (the fenced
    lease) and ``epoch`` (fencing-token high-water mark).
    """

    def __init__(
        self,
        backend,
        root: str,
        *,
        member_ttl: float = 30.0,
        lease_ttl: float = 30.0,
        min_servers: int = 2,
        election_delay: float = float("inf"),
        clock=time.time,
    ) -> None:
        self.backend = backend
        self.root = root.rstrip("/")
        self.member_ttl = member_ttl
        self.lease_ttl = lease_ttl
        self.min_servers = min_servers
        self.election_delay = election_delay
        self._now = clock

    # -- key layout ------------------------------------------------------

    def _member_key(self, name: str) -> str:
        return posixpath.join(self.root, "members", name)

    @property
    def _members_prefix(self) -> str:
        return posixpath.join(self.root, "members")

    @property
    def _seq_prefix(self) -> str:
        return posixpath.join(self.root, "seq")

    @property
    def _leader_key(self) -> str:
        return posixpath.join(self.root, "leader")

    @property
    def _epoch_key(self) -> str:
        return posixpath.join(self.root, "epoch")

    # -- membership (register/unregister, DistributedManager.java:232) --

    def _alloc_seq(self, name: str) -> int:
        """Reserve the next creation-order slot — the czxid analog.
        ``put_if_absent`` makes the slot unique even when two members
        register concurrently; the loser retries on the next number."""
        while True:
            nxt = max(
                (
                    int(s)
                    for s in self.backend.list(self._seq_prefix)
                    if s.isdigit()
                ),
                default=0,
            ) + 1
            key = posixpath.join(self._seq_prefix, f"{nxt:012d}")
            if self.backend.put_if_absent(key, name.encode()):
                return nxt

    def register(
        self,
        name: str,
        *,
        version: int = 0,
        server_type: str = ServerType.ONLINE,
        setter: str | None = None,
    ) -> ServerStatus:
        """Create or refresh this member's registration (ephemeral-node
        create-or-setData, ``DistributedManager.java:232-250``).  First
        registration stamps ``seq``/``created``; re-registration carries
        them forward so creation order is stable."""
        existing = self._read_member(name)
        if existing is None:
            seq = self._alloc_seq(name)
            created = self._now()
        else:
            seq, created = existing.seq, existing.created
        payload = {
            "version": int(version),
            "type": server_type,
            "setter": setter,
            "seq": seq,
            "created": created,
        }
        self.backend.replace(
            self._member_key(name), json.dumps(payload).encode()
        )
        return self._read_member(name)  # type: ignore[return-value]

    def heartbeat(self, name: str) -> None:
        """Bump the member's mtime without touching its payload — the
        session keep-alive that stands in for ZooKeeper's ephemerality."""
        raw = self.backend.read(self._member_key(name))
        if raw is not None:
            self.backend.replace(self._member_key(name), raw)

    def unregister(self, name: str) -> None:
        self.backend.delete(self._member_key(name))

    def _read_member(self, name: str) -> ServerStatus | None:
        key = self._member_key(name)
        raw = self.backend.read(key)
        if raw is None:
            return None
        mt = self.backend.mtime(key)
        if mt is None:
            return None
        try:
            p = json.loads(raw)
        except ValueError:
            return None
        return ServerStatus(
            name=name,
            version=int(p["version"]),
            type=p["type"],
            setter=p.get("setter"),
            seq=int(p["seq"]),
            created=float(p["created"]),
            mtime=mt,
            alive=(self._now() - mt) <= self.member_ttl,
        )

    def members(self, *, only_alive: bool = False) -> list[ServerStatus]:
        out = []
        for name in self.backend.list(self._members_prefix):
            st = self._read_member(name)
            if st is None:
                continue
            if only_alive and not st.alive:
                continue
            out.append(st)
        return sorted(out, key=lambda s: (s.seq, s.name))

    # -- leadership ------------------------------------------------------

    def _read_lease(self) -> tuple[dict, float] | None:
        raw = self.backend.read(self._leader_key)
        mt = self.backend.mtime(self._leader_key)
        if raw is None or mt is None:
            return None
        try:
            return json.loads(raw), mt
        except ValueError:
            return None

    def epoch(self) -> int:
        """Current fencing-token high-water mark (0 before any master)."""
        raw = self.backend.read(self._epoch_key)
        hw = int(raw) if raw else 0
        lease = self._read_lease()
        if lease is not None:
            hw = max(hw, int(lease[0].get("epoch", 0)))
        return hw

    def leader(self) -> ServerStatus | None:
        """The live master, or None.  A lease is only honored while its
        mtime is within ``lease_ttl`` AND its holder's registration is
        alive — a dead holder's lease is reported vacant even before the
        lease itself ages out (``getMaster`` over ephemeral nodes sees
        the same thing the instant the session drops)."""
        lease = self._read_lease()
        if lease is None:
            return None
        payload, mt = lease
        if (self._now() - mt) > self.lease_ttl:
            return None
        holder = self._read_member(payload.get("name", ""))
        if holder is None or not holder.alive:
            return None
        if holder.type != ServerType.MASTER:
            # claimed but not yet re-registered as MASTER — still the
            # leader for mutual-exclusion purposes
            pass
        return holder

    def renew(self, name: str) -> bool:
        """Master keep-alive: bump the lease mtime (and the member
        heartbeat).  Returns False when this node no longer holds the
        lease — the fenced demotion signal."""
        lease = self._read_lease()
        if lease is None or lease[0].get("name") != name:
            return False
        self.backend.replace(
            self._leader_key, json.dumps(lease[0]).encode()
        )
        self.heartbeat(name)
        return True

    def resign(self, name: str) -> None:
        """Voluntary step-down: release the lease iff held by ``name``
        and re-register as ONLINE (the restart path in the reference
        re-enters the pool at ONLINE)."""
        lease = self._read_lease()
        if lease is not None and lease[0].get("name") == name:
            self.backend.delete(self._leader_key)
        me = self._read_member(name)
        if me is not None and me.type == ServerType.MASTER:
            self.register(
                name,
                version=me.version,
                server_type=ServerType.ONLINE,
                setter=None,
            )

    def campaign(self, name: str) -> bool:
        """One pass of the ``getServers``-as-server flow
        (``DistributedManager.java:155-190``): if a live master exists,
        report whether it is us; otherwise run the election rule over
        the live electable snapshot, and — only if WE won — claim the
        fenced lease and re-stamp the losers NEED_RESTORE.

        Returns True iff ``name`` is the master when the call returns.
        """
        # capture the fencing high-water mark BEFORE any steal: the
        # lease may carry an epoch the ``epoch`` key never recorded
        # (claimant crashed between claim and persist), and the token
        # must stay monotonic across exactly that crash
        epoch_floor = self.epoch()

        # Evaluate the seat from ONE lease read.  Staleness must be
        # re-verified on the same read the delete acts on: deciding
        # from an earlier ``leader() is None`` and then deleting
        # whatever exists would destroy a lease claimed in between —
        # a fresh master would be unseated by its own losers.
        lease = self._read_lease()
        if lease is not None:
            payload, mt = lease
            holder = self._read_member(payload.get("name", ""))
            if (self._now() - mt) <= self.lease_ttl and (
                holder is not None and holder.alive
            ):
                return holder.name == name
            # verifiably stale (aged lease, or dead/missing holder):
            # steal like a commit lock — delete, then race the
            # conditional create below
            self.backend.delete(self._leader_key)

        live = self.members(only_alive=True)
        candidates = [s for s in live if s.type in ServerType.ELECTABLE]
        winner = _elect(candidates)
        if winner is None or winner.name != name:
            return False

        # lone-ONLINE delay gate (DistributedManager.java:307-312): a
        # single fresh ONLINE server is a *candidate* master until the
        # election delay elapses, so a briefly-partitioned quorum does
        # not instantly crown a newcomer with no peers to restore from
        if (
            len(candidates) < self.min_servers
            and winner.type == ServerType.ONLINE
            and (self._now() - winner.created) < self.election_delay
        ):
            return False

        new_epoch = max(self.epoch(), epoch_floor) + 1
        claim = {"name": name, "epoch": new_epoch}
        if not self.backend.put_if_absent(
            self._leader_key, json.dumps(claim).encode()
        ):
            # lost the conditional create to a concurrent claimant
            current = self.leader()
            return current is not None and current.name == name

        # persist the fencing high-water mark, promote self, demote the
        # rest of the electable pool to NEED_RESTORE with setter = us
        # (the new-master branch of getServers,
        # DistributedManager.java:165-172)
        self.backend.replace(self._epoch_key, str(new_epoch).encode())
        me = self._read_member(name)
        self.register(
            name,
            version=me.version if me else 0,
            server_type=ServerType.MASTER,
            setter=name,
        )
        for s in live:
            if s.name != name and s.type in ServerType.RESTAMPED:
                self.register(
                    s.name,
                    version=s.version,
                    server_type=ServerType.NEED_RESTORE,
                    setter=name,
                )
        return True
