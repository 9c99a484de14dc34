"""Feedback / analytics / result-cache database.

Capability of reference feedback_database.py:343-694 (tables query_feedback,
query_cache, analytics_summary, system_performance; feedback storage;
result cache with TTL + hit counting; performance summaries) and a working
subset of its AdvancedAnalytics (temporal patterns, keyword frequency,
anomaly detection, optimization suggestions — feedback_database.py:25-328).

Implementation note: the reference uses aiosqlite + a per-request asyncio
loop purely to dodge Flask threading; here plain sqlite3 with per-thread
connections serves the same capability without the event-loop machinery.
"""

from __future__ import annotations

import json
import math
import sqlite3
import threading
import time
from collections import Counter
from pathlib import Path
from typing import Any, Dict, List, Optional


class FeedbackDatabase:
    def __init__(self, db_path: str | Path = "feedback.db", cache_ttl_s: float = 3600.0) -> None:
        self.db_path = str(db_path)
        self.cache_ttl_s = cache_ttl_s
        self._local = threading.local()
        with self._conn() as c:
            c.executescript("""
                CREATE TABLE IF NOT EXISTS query_feedback (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    timestamp REAL NOT NULL,
                    session_id TEXT,
                    query TEXT NOT NULL,
                    strategy TEXT,
                    rating INTEGER,
                    comment TEXT,
                    response_time_s REAL,
                    result_count INTEGER
                );
                CREATE TABLE IF NOT EXISTS query_cache (
                    query_hash TEXT PRIMARY KEY,
                    query TEXT NOT NULL,
                    result_json TEXT NOT NULL,
                    created_at REAL NOT NULL,
                    hit_count INTEGER DEFAULT 0,
                    last_hit_at REAL
                );
                CREATE TABLE IF NOT EXISTS analytics_summary (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    date TEXT NOT NULL,
                    total_queries INTEGER,
                    avg_rating REAL,
                    avg_response_time_s REAL,
                    details_json TEXT
                );
                CREATE TABLE IF NOT EXISTS system_performance (
                    id INTEGER PRIMARY KEY AUTOINCREMENT,
                    timestamp REAL NOT NULL,
                    cpu_pct REAL,
                    mem_pct REAL,
                    queries_per_minute REAL,
                    error_rate REAL
                );
            """)

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.db_path)
            conn.execute("PRAGMA journal_mode=WAL")
            self._local.conn = conn
        return conn

    # ------------------------------------------------------------ feedback

    def store_feedback(self, *, query: str, rating: Optional[int] = None,
                       comment: Optional[str] = None, strategy: Optional[str] = None,
                       session_id: Optional[str] = None, response_time_s: Optional[float] = None,
                       result_count: Optional[int] = None) -> int:
        with self._conn() as c:
            cur = c.execute(
                """INSERT INTO query_feedback(timestamp, session_id, query, strategy,
                       rating, comment, response_time_s, result_count)
                   VALUES (?,?,?,?,?,?,?,?)""",
                (time.time(), session_id, query, strategy, rating, comment,
                 response_time_s, result_count))
            return cur.lastrowid

    # --------------------------------------------------------- result cache

    def cache_get(self, query_hash: str, now: Optional[float] = None) -> Optional[dict]:
        now = time.time() if now is None else now
        row = self._conn().execute(
            "SELECT result_json, created_at FROM query_cache WHERE query_hash=?",
            (query_hash,)).fetchone()
        if row is None:
            return None
        result_json, created_at = row
        if now - created_at > self.cache_ttl_s:
            return None
        with self._conn() as c:
            c.execute(
                "UPDATE query_cache SET hit_count=hit_count+1, last_hit_at=? WHERE query_hash=?",
                (now, query_hash))
        return json.loads(result_json)

    def cache_put(self, query_hash: str, query: str, result: dict,
                  now: Optional[float] = None) -> None:
        now = time.time() if now is None else now
        with self._conn() as c:
            c.execute(
                """INSERT INTO query_cache(query_hash, query, result_json, created_at)
                   VALUES (?,?,?,?)
                   ON CONFLICT(query_hash) DO UPDATE SET
                     result_json=excluded.result_json, created_at=excluded.created_at""",
                (query_hash, query, json.dumps(result, default=str), now))

    def cache_stats(self) -> dict:
        row = self._conn().execute(
            "SELECT COUNT(*), COALESCE(SUM(hit_count),0) FROM query_cache").fetchone()
        return {"entries": row[0], "total_hits": row[1]}

    # -------------------------------------------------------------- metrics

    def record_system_performance(self, *, cpu_pct: float = 0.0, mem_pct: float = 0.0,
                                  queries_per_minute: float = 0.0, error_rate: float = 0.0) -> None:
        with self._conn() as c:
            c.execute(
                """INSERT INTO system_performance(timestamp, cpu_pct, mem_pct,
                       queries_per_minute, error_rate) VALUES (?,?,?,?,?)""",
                (time.time(), cpu_pct, mem_pct, queries_per_minute, error_rate))

    def recent_system_performance(self, limit: int = 10) -> List[dict]:
        rows = self._conn().execute(
            """SELECT timestamp, cpu_pct, mem_pct, queries_per_minute, error_rate
               FROM system_performance ORDER BY timestamp DESC LIMIT ?""",
            (limit,)).fetchall()
        return [{"timestamp": r[0], "cpu_pct": r[1], "mem_pct": r[2],
                 "queries_per_minute": r[3], "error_rate": r[4]} for r in rows]

    def performance_summary(self, window_s: float = 24 * 3600) -> dict:
        cutoff = time.time() - window_s
        rows = self._conn().execute(
            """SELECT rating, response_time_s, result_count FROM query_feedback
               WHERE timestamp >= ?""", (cutoff,)).fetchall()
        ratings = [r[0] for r in rows if r[0] is not None]
        times = [r[1] for r in rows if r[1] is not None]
        return {
            "total_queries": len(rows),
            "avg_rating": sum(ratings) / len(ratings) if ratings else None,
            "avg_response_time_s": sum(times) / len(times) if times else None,
            "cache": self.cache_stats(),
        }

    # ------------------------------------------------------------ analytics

    def temporal_patterns(self, window_s: float = 7 * 24 * 3600) -> Dict[int, int]:
        """Queries per hour-of-day."""
        cutoff = time.time() - window_s
        rows = self._conn().execute(
            "SELECT timestamp FROM query_feedback WHERE timestamp >= ?", (cutoff,)).fetchall()
        hours = Counter(time.localtime(r[0]).tm_hour for r in rows)
        return dict(sorted(hours.items()))

    def keyword_frequency(self, top_n: int = 20, window_s: float = 7 * 24 * 3600) -> List[tuple]:
        cutoff = time.time() - window_s
        rows = self._conn().execute(
            "SELECT query FROM query_feedback WHERE timestamp >= ?", (cutoff,)).fetchall()
        stop = {"the", "a", "an", "is", "of", "in", "on", "to", "for", "what", "and", "or"}
        words = Counter()
        for (q,) in rows:
            words.update(w for w in q.lower().split() if w not in stop and len(w) > 2)
        return words.most_common(top_n)

    def detect_anomalies(self, window_s: float = 24 * 3600, z_threshold: float = 3.0) -> List[dict]:
        """Response-time outliers (z-score over the window)."""
        cutoff = time.time() - window_s
        rows = self._conn().execute(
            """SELECT query, response_time_s FROM query_feedback
               WHERE timestamp >= ? AND response_time_s IS NOT NULL""", (cutoff,)).fetchall()
        times = [r[1] for r in rows]
        if len(times) < 5:
            return []
        mean = sum(times) / len(times)
        var = sum((t - mean) ** 2 for t in times) / len(times)
        std = math.sqrt(var) or 1e-9
        return [
            {"query": q, "response_time_s": t, "z": (t - mean) / std}
            for q, t in rows if (t - mean) / std > z_threshold
        ]

    def session_journeys(self, window_s: float = 7 * 24 * 3600,
                         max_sessions: int = 50) -> Dict[str, List[str]]:
        """Per-session ordered query sequences (reference AdvancedAnalytics
        session journey capability)."""
        cutoff = time.time() - window_s
        rows = self._conn().execute(
            """SELECT session_id, query FROM query_feedback
               WHERE timestamp >= ? AND session_id IS NOT NULL
               ORDER BY timestamp""", (cutoff,)).fetchall()
        journeys: Dict[str, List[str]] = {}
        for sid, q in rows:
            journeys.setdefault(sid, []).append(q)
            if len(journeys) > max_sessions:
                break
        return journeys

    def strategy_transitions(self, window_s: float = 7 * 24 * 3600) -> Dict[str, int]:
        """Counts of strategy A->B transitions within sessions."""
        cutoff = time.time() - window_s
        rows = self._conn().execute(
            """SELECT session_id, strategy FROM query_feedback
               WHERE timestamp >= ? AND session_id IS NOT NULL AND strategy IS NOT NULL
               ORDER BY session_id, timestamp""", (cutoff,)).fetchall()
        out: Dict[str, int] = {}
        prev_sid = prev_strat = None
        for sid, strat in rows:
            if sid == prev_sid and prev_strat is not None:
                key = f"{prev_strat}->{strat}"
                out[key] = out.get(key, 0) + 1
            prev_sid, prev_strat = sid, strat
        return out

    def optimization_suggestions(self) -> List[str]:
        out: List[str] = []
        summary = self.performance_summary()
        if summary["avg_response_time_s"] and summary["avg_response_time_s"] > 5.0:
            out.append("average response time exceeds 5s: consider enlarging the "
                       "result cache TTL or pre-warming encoder compiles")
        if summary["avg_rating"] is not None and summary["avg_rating"] < 3.0:
            out.append("low average rating: review rerank blend weights and "
                       "retrieval candidate count")
        stats = self.cache_stats()
        if stats["entries"] > 0 and stats["total_hits"] == 0:
            out.append("result cache has entries but no hits: queries may be "
                       "too unique for caching to help")
        return out
