from . import general, graphics, image, quaternion, rigid, schedules, sh  # noqa: F401
