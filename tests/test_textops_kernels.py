

def test_nfkc_clean_kernel():
    """operators/textops.nfkc_clean against the Unicode standard's own
    mappings: fullwidth, ligatures, compatibility forms, combining
    composition, control strip, unicode-whitespace collapse + trim."""
    from etl_sprint_2_5_spark.operators.textops import nfkc_clean

    assert nfkc_clean("\uFF21\uFF42\uFF17") == "Ab7"
    assert nfkc_clean("\uFB01 \uFB04 \uFB00") == "fi ffl ff"
    assert nfkc_clean("\u216B \u339E \u00B2") == "XII km 2"
    # combining acute composes to a single code point
    out = nfkc_clean("cafe\u0301")
    assert out == "caf\u00E9" and len(out) == 4
    # control chars stripped, unicode spaces collapsed, outer trim
    assert nfkc_clean(" a\u0007b\u00A0\u2009 c\u3000d ") == "ab c d"
    assert nfkc_clean("") == ""
    # already-clean ASCII is a fixed point
    assert nfkc_clean("plain ascii text 123") == "plain ascii text 123"
