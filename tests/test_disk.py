"""Low-disk pause laws (LowDiskPauseProcessor.java:82-185,
DiskSpaceMonitor.java) — df parsing, recheck cadence, thresholds."""

from __future__ import annotations

from heritrix_spark.operators.disk import (
    disk_space_should_pause,
    low_disk_recheck_tally,
    low_disk_should_pause,
    parse_df_output,
)

DF = (
    "Filesystem     1K-blocks      Used Available Use% Mounted on\n"
    "/dev/root      102400000  90000000  12400000  88% /\n"
    "tmpfs           16384000         0  16384000   0% /dev/shm\n"
    "/dev/sdb1       51200000  51000000    200000 100% /data\n"
)


def test_parse_df_output_and_header_gate():
    assert parse_df_output(DF) == [
        ("/", 12400000), ("/dev/shm", 16384000), ("/data", 200000),
    ]
    # header mismatch -> [] (the :121-125 "unacceptable output" arm)
    assert parse_df_output("garbage\n/dev/sda 1 2 3 4% /x\n") == []
    assert parse_df_output("") == []


def test_low_disk_pause_threshold():
    # /data has 200000K available, default threshold 512000K
    assert low_disk_should_pause(DF, ["/data"])
    assert not low_disk_should_pause(DF, ["/"])          # 12.4G avail
    assert not low_disk_should_pause(DF, ["/data"], pause_threshold_kb=100_000)
    assert not low_disk_should_pause(DF, ["/nope"])       # unmonitored
    assert not low_disk_should_pause("bad output", ["/data"])  # gate


def test_recheck_tally_cadence_and_reset():
    kb = 1024
    # threshold 10KB: fires when the running tally EXCEEDS 10KB (:137
    # strict >), then resets
    sizes = [4 * kb, 4 * kb, 4 * kb, 11 * kb, 1 * kb]
    assert low_disk_recheck_tally(sizes, recheck_threshold_kb=10) == [2, 3]
    # integer-division law: exactly threshold KB does NOT fire
    assert low_disk_recheck_tally([10 * kb], recheck_threshold_kb=10) == []
    assert low_disk_recheck_tally([10 * kb + 1024], recheck_threshold_kb=10) == [0]


def test_disk_space_monitor_paths():
    stats = {"/a": 600 * 1024 * 1024, "/b": 100 * 1024 * 1024}
    probe = stats.get  # None for missing paths = ignored
    assert not disk_space_should_pause(probe, ["/a"])
    assert disk_space_should_pause(probe, ["/b"])
    assert not disk_space_should_pause(probe, ["/missing"])
    # config paths monitored by default, toggle off respected
    assert disk_space_should_pause(probe, ["/a"], config_paths=["/b"])
    assert not disk_space_should_pause(
        probe, ["/a"], config_paths=["/b"], monitor_config_paths=False
    )
    assert disk_space_should_pause(probe, ["/a"], pause_threshold_mib=700)
