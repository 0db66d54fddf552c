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

Steal-path races are closed with the backend's conditional verbs
(r6 ADVICE):

- **steal** is a compare-and-delete on the exact stale lease bytes a
  claimant verified — it can never remove a successor's fresh claim
  (two stealers: both conditional deletes target the SAME stale bytes,
  at most one lease deletion happens, then exactly one
  ``put_if_absent`` wins).
- **renew** is a CAS replace that increments a ``renew`` counter in
  the lease payload, so the lease BYTES change on every renewal (not
  just the mtime).  A stealer's conditional delete conditions on the
  bytes it read; any renew landing in between changes those bytes and
  the steal aborts — byte-level fencing, closing the race in BOTH
  directions (a renew after a steal fails and self-demotes; a steal
  after a renew fails and retries from a fresh read).
- **fencing tokens are minted by conditional-create reservation**
  (``epochs/<n>``) BEFORE the claim, so two concurrent claimants can
  never hold the same epoch; a writer holding epoch *e* is fenced by
  any state stamped with *e' > e*.
- **member heartbeat** is the same CAS-touch, so it cannot resurrect a
  payload a new master just restamped to NEED_RESTORE.
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

    def _gc_seq_slots(self) -> None:
        """Compact orphaned creation-order slots — the ``seq/`` analog
        of :meth:`_gc_epoch_slots` (r8 verdict nit 3a).  ``_alloc_seq``
        lists the whole prefix on every first registration, and every
        unregister→re-register churn strands the departed member's old
        slot (re-registration carries seq forward, but a fresh
        registration after an unregister allocates anew) — unbounded
        key growth under member-name churn.

        A slot is garbage once (a) its claimant name no longer has a
        member record, or that record carries a DIFFERENT seq, and
        (b) the slot is older than ``member_ttl`` — the TTL guards the
        window between ``_alloc_seq``'s reservation and ``register``'s
        member-record write.  Deleting such a slot cannot disturb
        creation order: no live member references it, and because every
        slot of every current member survives the sweep,
        ``_alloc_seq``'s max stays ≥ every live seq — a re-used number
        is always above all coexisting members', which is the only
        ordering the czxid analog promises (relative order among
        members that are alive together)."""
        now = self._now()
        for s in self.backend.list(self._seq_prefix):
            if not s.isdigit():
                continue
            key = posixpath.join(self._seq_prefix, s)
            mt = self.backend.mtime(key)
            if mt is None or (now - mt) <= self.member_ttl:
                continue
            raw = self.backend.read(key)
            if raw is None:
                continue
            holder = self._read_member(raw.decode(errors="replace"))
            if holder is None or holder.seq != int(s):
                self.backend.delete(key)

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
            self._gc_seq_slots()  # first registrations pay the sweep
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
        session keep-alive that stands in for ZooKeeper's ephemerality.

        CAS-touch, not blind replace: a replace of the payload read a
        moment ago could overwrite a concurrent restamp (a new master's
        NEED_RESTORE demotion) with the member's stale ONLINE/SLAVE
        state — the r6 ADVICE lost-update.  ``replace_if_value`` with
        expected == data bumps mtime only while the payload is still
        exactly what was read; a lost race is a silent no-op (the
        restamped payload's own mtime is fresh)."""
        raw = self.backend.read(self._member_key(name))
        if raw is not None:
            self.backend.replace_if_value(self._member_key(name), raw, raw)

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

    def _read_lease_raw(self) -> tuple[bytes, dict, float] | None:
        """(raw bytes, parsed payload, mtime) — raw rides along so CAS
        verbs can condition on exactly the content that was read."""
        raw = self.backend.read(self._leader_key)
        mt = self.backend.mtime(self._leader_key)
        if raw is None or mt is None:
            return None
        try:
            return raw, json.loads(raw), mt
        except ValueError:
            return None

    def _read_lease(self) -> tuple[dict, float] | None:
        got = self._read_lease_raw()
        return None if got is None else (got[1], got[2])

    @property
    def _epochs_prefix(self) -> str:
        return posixpath.join(self.root, "epochs")

    def epoch(self) -> int:
        """Current fencing-token high-water mark (0 before any master):
        the max over the persisted high-water key, the live lease, and
        every RESERVED epoch slot — a token someone minted is spent
        even if its claim never landed (monotonicity survives the
        claimant crashing between mint and claim)."""
        raw = self.backend.read(self._epoch_key)
        hw = int(raw) if raw else 0
        lease = self._read_lease()
        if lease is not None:
            hw = max(hw, int(lease[0].get("epoch", 0)))
        slots = [
            int(s)
            for s in self.backend.list(self._epochs_prefix)
            if s.isdigit()
        ]
        return max(hw, max(slots, default=0))

    def _gc_epoch_slots(self, high_water: int) -> None:
        """Compact reservation slots at/below the persisted high-water
        mark.  ``epoch()`` lists the whole ``epochs/`` prefix on every
        campaign and leader-path read, and every election (plus every
        lost mint race) reserves a permanent slot — unbounded growth
        for a long-lived group.  Once ``campaign`` has persisted the
        high-water key, every slot n <= high_water is dominated by it,
        so deleting them cannot regress ``epoch()`` monotonicity; slots
        ABOVE the high water (a concurrent claimant mid-mint, or a
        crashed claimant's burned token) are left alone."""
        for s in self.backend.list(self._epochs_prefix):
            if s.isdigit() and int(s) <= high_water:
                self.backend.delete(posixpath.join(self._epochs_prefix, s))

    def _mint_epoch(self) -> int:
        """Reserve a UNIQUE fencing token via conditional create —
        BEFORE any lease claim, so two concurrent claimants can never
        hold the same epoch (the r6 ADVICE duplicate-token race: the
        old flow persisted the epoch key only after claiming, leaving
        a window where both readers computed the same +1)."""
        while True:
            nxt = self.epoch() + 1
            key = posixpath.join(self._epochs_prefix, f"{nxt:012d}")
            if self.backend.put_if_absent(key, b"reserved"):
                return nxt

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
        """Master keep-alive: advance the lease (and the member
        heartbeat).  Returns False when this node no longer holds the
        lease — the fenced demotion signal.

        The renewal is a CAS that CHANGES the lease bytes: the payload
        carries a monotonically increasing ``renew`` counter, so every
        successful renew invalidates any conditional delete a stealer
        staged against the pre-renew bytes (the r7 ADVICE residual
        race: a CAS-touch with expected == data left the bytes equal,
        so a stealer holding a stale read could still delete a lease
        that had just been renewed — mtime freshness alone does not
        protect it, because ``delete_if_value`` compares value, not
        mtime).  With a byte-changing renew, the race is closed in
        both directions: a renew racing a steal either lands first
        (the steal's delete then mismatches and aborts) or fails its
        own CAS and self-demotes; the fresh claim can never be
        overwritten and a fresh renewal can never be unseated."""
        got = self._read_lease_raw()
        if got is None or got[1].get("name") != name:
            return False
        raw, payload = got[0], got[1]
        bumped = dict(payload)
        bumped["renew"] = int(payload.get("renew", 0)) + 1
        if not self.backend.replace_if_value(
            self._leader_key, json.dumps(bumped).encode(), raw
        ):
            # lease changed under us (stolen/re-claimed) — demoted
            return False
        self.heartbeat(name)
        return True

    def resign(self, name: str) -> None:
        """Voluntary step-down: release the lease iff held by ``name``
        and re-register as ONLINE (the restart path in the reference
        re-enters the pool at ONLINE).  Conditional delete: releasing
        a lease that changed since the read would unseat a successor."""
        got = self._read_lease_raw()
        if got is not None and got[1].get("name") == name:
            self.backend.delete_if_value(self._leader_key, got[0])
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
        # Evaluate the seat from ONE lease read, and make the steal a
        # COMPARE-AND-DELETE on exactly those bytes: a blind delete
        # landing after a rival's fresh put_if_absent would destroy the
        # just-claimed lease (the r6 ADVICE unguarded-delete race) — a
        # conditional delete can only remove the stale lease it
        # verified, never a successor's claim.
        got = self._read_lease_raw()
        if got is not None:
            raw, payload, mt = got
            holder = self._read_member(payload.get("name", ""))
            if (self._now() - mt) <= self.lease_ttl and (
                holder is not None and holder.alive
            ):
                return holder.name == name
            # verifiably stale (aged lease, or dead/missing holder):
            # compare-and-delete, then race the conditional create
            # below.  A failed delete means the lease moved — the
            # put_if_absent below then loses cleanly.
            self.backend.delete_if_value(self._leader_key, raw)

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

        # mint a UNIQUE fencing token (conditional-create reservation)
        # BEFORE claiming — two concurrent claimants get different
        # epochs by construction, and a crash between mint and claim
        # only burns a token (epoch() counts reserved slots)
        new_epoch = self._mint_epoch()
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
        self._gc_epoch_slots(new_epoch)
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
