"""Video file-extension classification.

The reference ships a generated 360-entry list of every ffmpeg demuxer name
(crates/app/src/video_exts.rs); we curate the practically relevant container
extensions instead (the reference list also contains audio-only formats).
Anything decodable by the OpenCV/ffmpeg backend can be added here.
"""

VIDEO_EXTS = frozenset(
    """
    3g2 3gp asf avi divx dv f4v flv h264 h265 hevc m2t m2ts m2v m4v mjpeg mjpg
    mkv mov mp4 mpeg mpg mts mxf nut ogv qt rm rmvb ts vob webm wmv y4m yuv
    avchd 264 265 av1 ivf drc gif gifv mng mpe mpv m1v svi 3gpp 3gpp2 mk3d
    mks f4p f4a f4b
    """.split()
)


def is_video_ext(ext: str) -> bool:
    return ext.lower().lstrip(".") in VIDEO_EXTS
