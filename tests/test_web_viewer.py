"""The scripted web-viewer check, in the suite (see
scripts/check_viewer.py for the full story including the image's
no-browser/no-JS-runtime constraint)."""

import sys


def test_viewer_end_to_end_check():
    sys.path.insert(0, "scripts")
    import check_viewer

    # a different port than the standalone script, in case both run
    check_viewer.PORT = 8617
    assert check_viewer.main() == 0
