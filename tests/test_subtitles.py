from flash_vstream_tpu.eval.subtitles import parse_srt, subtitles_for_frames

SRT = """1
00:00:01,000 --> 00:00:04,000
Hello <i>world</i>.

2
00:00:05,500 --> 00:00:08,000
Second line
continues here.

3
00:01:00,000 --> 00:01:02,000
Much later.
"""


def test_parse_srt():
    cues = parse_srt(SRT)
    assert len(cues) == 3
    assert cues[0]["start"] == 1.0 and cues[0]["end"] == 4.0
    assert cues[0]["text"] == "Hello world."          # tags stripped
    assert cues[1]["text"] == "Second line continues here."
    assert cues[2]["start"] == 60.0


def test_subtitles_for_frames():
    cues = parse_srt(SRT)
    # frames sampled at t = 2, 6, 30 -> cues 1 and 2 overlap, 3 doesn't
    out = subtitles_for_frames(cues, [2.0, 6.0, 30.0])
    assert out == "Hello world.\nSecond line continues here."
    # dedup: same cue hit by two frames appears once
    out2 = subtitles_for_frames(cues, [1.5, 3.0])
    assert out2 == "Hello world."
