"""Host-sharded robots.txt cache actors.

Re-expression of the reference's ``robot_cache`` + None-placeholder
single-flight protocol (web_crawler/crawler/frontier.py:26-27,98-110):
actor-per-host-shard serialization replaces the lock — two concurrent
requests for the same host land on the same actor and the second sees the
cached parser, so each robots body is fetched/parsed exactly once.

"Fetching" robots.txt is a lookup into the broadcast robots fixture table
(no network; FIXTURES.md §3); a missing host yields a default-allow parser,
mirroring create_robot's except path (frontier.py:80-82). The parser is
urllib.robotparser.RobotFileParser — the exact parser the reference uses.
"""

from __future__ import annotations

from typing import Dict, List, Optional
from urllib.robotparser import RobotFileParser

import numpy as np

import ray

from ..functions.urls import hash64_batch


@ray.remote(num_cpus=0)
class RobotsShard:
    def __init__(
        self,
        robots_bodies: Dict[str, str],
        fetch_http: bool = False,
        timeout: float = 5.0,
    ):
        # the driver passes a ray.put ref; Ray dereferences it on delivery,
        # so the dict is stored once in the object store (broadcast), not
        # per-actor serialized.
        self.bodies: Dict[str, str] = robots_bodies
        self.parsers: Dict[str, Optional[RobotFileParser]] = {}
        # http transport: a host missing from the fixture dict fetches its
        # /robots.txt over the network ONCE (this shard owns the host, so
        # the actor-serialized single-flight still holds); any failure →
        # default-allow, create_robot's except path (frontier.py:80-82)
        self.fetch_http = fetch_http
        self.timeout = timeout

    def _parser(self, host: str) -> Optional[RobotFileParser]:
        if host not in self.parsers:
            body = self.bodies.get(host)
            if body is None and self.fetch_http:
                from ..stages.http_fetch import fetch_robots_body

                body = fetch_robots_body(host, self.timeout)
            if body is None:
                self.parsers[host] = None  # default allow, no crawl delay
            else:
                rp = RobotFileParser()
                rp.parse(body.splitlines())
                self.parsers[host] = rp
        return self.parsers[host]

    def check_hosts(self, hosts: List[str], user_agent: str) -> Dict[str, float]:
        """Per host: crawl_delay (0.0 when absent). Read-only + cached, so
        idempotent under task replay; host-first-seen accounting (the
        reference's create_robot clock stamp, frontier.py:75-77) lives in
        the driver's checkpointable wave state instead."""
        out = {}
        for host in hosts:
            rp = self._parser(host)
            delay = 0.0
            if rp is not None:
                d = rp.crawl_delay(user_agent)
                delay = float(d) if d is not None else 0.0
            out[host] = delay
        return out

    def can_fetch(self, host: str, user_agent: str, urls: List[str]) -> np.ndarray:
        rp = self._parser(host)
        if rp is None:
            return np.ones(len(urls), dtype=bool)
        return np.fromiter(
            (rp.can_fetch(user_agent, u) for u in urls), dtype=bool, count=len(urls)
        )

    def can_fetch_multi(
        self, hosts: List[str], user_agent: str, urls: List[str]
    ) -> np.ndarray:
        """Mixed-host batch: one RPC covers every URL of this shard's hosts
        in a batch (the wave pre-pass), instead of one RPC per host group."""
        out = np.ones(len(urls), dtype=bool)
        for i, (h, u) in enumerate(zip(hosts, urls)):
            rp = self._parser(h)
            if rp is not None:
                out[i] = rp.can_fetch(user_agent, u)
        return out

class RobotsCache:
    """Handle over the shard pool; shard = hash64(host) % n."""

    def __init__(
        self,
        robots_bodies: Dict[str, str],
        num_shards: int = 4,
        fetch_http: bool = False,
        timeout: float = 5.0,
    ):
        ref = ray.put(robots_bodies or {})
        self.num_shards = num_shards
        self.shards = [
            RobotsShard.remote(ref, fetch_http=fetch_http, timeout=timeout)
            for _ in range(num_shards)
        ]

    def shard_for(self, host: str):
        return self.shards[int(hash64_batch([host])[0] % np.uint64(self.num_shards))]

    def check_hosts(self, hosts: List[str], user_agent: str) -> Dict[str, float]:
        by_shard: Dict[int, List[str]] = {}
        for h in hosts:
            s = int(hash64_batch([h])[0] % np.uint64(self.num_shards))
            by_shard.setdefault(s, []).append(h)
        futs = [
            self.shards[s].check_hosts.remote(hs, user_agent)
            for s, hs in by_shard.items()
        ]
        out: Dict[str, float] = {}
        for d in ray.get(futs):
            out.update(d)
        return out

    def can_fetch(self, host: str, user_agent: str, urls: List[str]) -> np.ndarray:
        return ray.get(self.shard_for(host).can_fetch.remote(host, user_agent, urls))
