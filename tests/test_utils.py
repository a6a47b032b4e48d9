

def test_set_process_title_roundtrip():
    """Linux /proc/self/comm shows the title the drivers set (the
    reference's setproctitle progress display, test*.py:146)."""
    import os
    from dctseg.utils.proctitle import set_process_title

    if not os.path.exists("/proc/self/comm"):
        return  # platform without procfs: set_process_title no-ops
    with open("/proc/self/comm") as f:
        old = f.read().strip()
    try:
        assert set_process_title("dctseg:testing")
        with open("/proc/self/comm") as f:
            assert f.read().strip() == "dctseg:testing"[:15]
    finally:
        set_process_title(old)
