"""CameraGrabber (UsbCamGrabber analog): conversion, queue, end-of-stream."""

import numpy as np

from scenelib2_tpu.io.camera import CameraGrabber


class FakeCapture:
    """Stands in for cv2.VideoCapture: N colour frames then end-of-stream."""

    def __init__(self, frames):
        self.frames = list(frames)
        self.released = False

    def read(self):
        if self.frames:
            return True, self.frames.pop(0)
        return False, None

    def release(self):
        self.released = True


def test_grabber_converts_and_resizes(rng):
    frames = [rng.integers(0, 256, size=(480, 640, 3), dtype=np.uint8) for _ in range(5)]
    grab = CameraGrabber(width=320, height=240, capture=FakeCapture(frames))
    got = list(grab)
    assert len(got) == 5
    for f in got:
        assert f.shape == (240, 320) and f.dtype == np.uint8
    grab.close()
    assert grab._cap.released


def test_grabber_grayscale_passthrough(rng):
    frames = [rng.integers(0, 256, size=(240, 320), dtype=np.uint8) for _ in range(3)]
    fake = FakeCapture([f.copy() for f in frames])
    grab = CameraGrabber(width=320, height=240, capture=fake)
    got = list(grab)
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)
    grab.close()


def test_grabber_get_frame_and_eos():
    fake = FakeCapture([np.zeros((240, 320), np.uint8)])
    grab = CameraGrabber(width=320, height=240, capture=fake)
    f = grab.get_frame(timeout=5.0)
    assert f is not None and f.shape == (240, 320)
    assert grab.get_frame(timeout=5.0) is None  # end of stream
    grab.close()
