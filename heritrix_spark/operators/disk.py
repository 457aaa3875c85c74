"""Low-disk crawl-pause guards.

Two reference implementations share the "pause the crawl before the
disk fills" job:

- ``LowDiskPauseProcessor`` (engine/.../postprocessor/
  LowDiskPauseProcessor.java:46-185, deprecated in the reference):
  tallies fetched content bytes and, every ``recheckThresholdKb`` of
  new content, parses ``df -k`` output and requests a pause when any
  monitored mount's Available column falls below ``pauseThresholdKb``.
- ``DiskSpaceMonitor`` (engine/.../monitor/DiskSpaceMonitor.java, the
  replacement): on every stats snapshot, probes
  ``File.getUsableSpace()`` for each monitored path (plus registered
  config paths) and pauses below ``pauseThresholdMiB``; non-existent
  paths are ignored.

Spark shape: disk state is inherently node-local, so like
``quota.crawl_limits`` these are DRIVER-LOOP guards, not DataFrame
operators — the deterministic laws (df parsing, recheck cadence,
threshold compare) live here and the stat probe is injected, exactly
as the crawl loop injects its clock. On a real cluster the "df output"
input is a per-executor stats table collected by the metrics sink; the
pause decision still folds to one boolean.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Sequence

#: LowDiskPauseProcessor.VALID_DF_OUTPUT (:106-107) — header sanity
#: gate; unacceptable output means PROCEED (never a false pause)
VALID_DF_OUTPUT = re.compile(
    r"(?s)^Filesystem\s+1K-blocks\s+Used\s+Available\s+Use%\s+Mounted on\n.*"
)

#: LowDiskPauseProcessor.AVAILABLE_EXTRACTOR (:108-109) — per-line
#: (available-KB, mount) pairs
AVAILABLE_EXTRACTOR = re.compile(r"(?m)\s(\d+)\s+\d+%\s+(\S+)$")

#: defaults (:82 pauseThresholdKb = 500 MiB, :94 recheckThresholdKb =
#: 200 MiB; DiskSpaceMonitor.java pauseThresholdMiB = 500)
PAUSE_THRESHOLD_KB = 500 * 1024
RECHECK_THRESHOLD_KB = 200 * 1024
PAUSE_THRESHOLD_MIB = 500


def parse_df_output(df_text: str) -> list[tuple[str, int]]:
    """``df -k`` output → [(mount, available_kb)] in line order; output
    failing the header gate yields [] (the :121-125 PROCEED arm)."""
    if not VALID_DF_OUTPUT.match(df_text or ""):
        return []
    return [
        (m.group(2), int(m.group(1)))
        for m in AVAILABLE_EXTRACTOR.finditer(df_text)
    ]


def low_disk_should_pause(
    df_text: str,
    monitor_mounts: Sequence[str],
    pause_threshold_kb: int = PAUSE_THRESHOLD_KB,
) -> bool:
    """checkAvailableSpace (:152-180): the FIRST monitored mount (in df
    output order) whose Available < threshold triggers the pause."""
    for mount, avail_kb in parse_df_output(df_text):
        if mount in monitor_mounts and avail_kb < pause_threshold_kb:
            return True
    return False


def low_disk_recheck_tally(
    content_sizes: Iterable[int],
    recheck_threshold_kb: int = RECHECK_THRESHOLD_KB,
) -> list[int]:
    """The innerProcessResult cadence (:135-147): a running byte tally;
    indices where ``tally // 1024 > recheckThresholdKb`` (strict, after
    adding that URI's bytes) fire a disk check and reset the tally.
    Returns the firing indices — the crawl loop probes the disk only
    at those points."""
    fires, tally = [], 0
    for i, size in enumerate(content_sizes):
        tally += int(size)
        if tally // 1024 > recheck_threshold_kb:
            fires.append(i)
            tally = 0
    return fires


def disk_space_should_pause(
    usable_bytes: Callable[[str], int | None],
    monitor_paths: Sequence[str],
    pause_threshold_mib: int = PAUSE_THRESHOLD_MIB,
    config_paths: Sequence[str] = (),
    monitor_config_paths: bool = True,
) -> bool:
    """DiskSpaceMonitor.checkAvailableSpace: probe every monitored path
    (plus config paths when enabled); ``usable_bytes`` returns None for
    a non-existent path, which is ignored (:checkAvailableSpace "Log
    and ignore"); any probe below thresholdMiB*2^20 pauses."""
    paths = list(monitor_paths)
    if monitor_config_paths:
        paths += list(config_paths)
    threshold = pause_threshold_mib * 1024 * 1024
    for p in paths:
        avail = usable_bytes(p)
        if avail is not None and avail < threshold:
            return True
    return False
