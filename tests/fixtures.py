"""Inline MJCF fixtures for oracle tests.

Small hand-authored mechanisms covering every joint type and stacking pattern
the engine supports.  These intentionally mirror the *coverage* of the
reference's test fixtures (`/root/reference/src/tests/test_xml/`) without
copying them.
"""

PENDULUM = """
<mujoco model="pendulum">
  <option timestep="0.01" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="pole" pos="0 0 1">
      <joint name="pivot" type="hinge" axis="0 1 0" damping="0.08"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 0.6" size="0.04" mass="0.7"/>
    </body>
  </worldbody>
  <actuator>
    <motor name="pivot" joint="pivot" gear="1.5" ctrllimited="true" ctrlrange="-10 10"/>
  </actuator>
</mujoco>
"""

ACROBOT = """
<mujoco model="acrobot">
  <option timestep="0.01"/>
  <default>
    <joint damping=".05"/>
    <geom type="capsule" mass="1"/>
  </default>
  <worldbody>
    <body name="upper" pos="0 0 2.2">
      <joint name="shoulder" type="hinge" axis="0 1 0"/>
      <geom name="upper" fromto="0 0 0 0 0 1" size="0.05"/>
      <body name="lower" pos="0 0 1">
        <joint name="elbow" type="hinge" axis="0 1 0"/>
        <geom name="lower" fromto="0 0 0 0 0 1" size="0.049"/>
        <site name="tip" pos="0 0 1" size="0.01"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor name="shoulder" joint="shoulder" gear="1" ctrllimited="true" ctrlrange="-100 100"/>
  </actuator>
</mujoco>
"""

# two hinge joints stacked on one body + a slide joint elsewhere
MIXED = """
<mujoco model="mixed">
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="gimbal" pos="0.1 0 1.5">
      <joint name="yaw" type="hinge" axis="0 0 1" damping="0.02"/>
      <joint name="pitch" type="hinge" axis="0 1 0" damping="0.03"/>
      <geom type="capsule" fromto="0 0 0 0.5 0 0" size="0.03" mass="0.4"/>
      <body name="tip_mass" pos="0.5 0 0">
        <joint name="extend" type="slide" axis="1 0 0" damping="0.1"/>
        <geom type="sphere" size="0.06" mass="0.2" pos="0.1 0.02 0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="yaw" gear="2"/>
    <motor joint="extend" gear="1"/>
  </actuator>
</mujoco>
"""

# free-floating body, no gravity (tests free-joint conventions, no contact)
FREE_BODY = """
<mujoco model="free_body">
  <option timestep="0.004" gravity="0 0 0"/>
  <worldbody>
    <body name="brick" pos="0.3 -0.2 1.0">
      <freejoint name="brick"/>
      <geom type="box" size="0.08 0.05 0.03" mass="0.5" pos="0.01 0.02 0.0"/>
    </body>
  </worldbody>
</mujoco>
"""

# ball joint pendulum
BALL_PENDULUM = """
<mujoco model="ball_pendulum">
  <option timestep="0.005"/>
  <worldbody>
    <body name="rod" pos="0 0 2">
      <joint name="ball" type="ball" damping="0.01"/>
      <geom type="capsule" fromto="0 0 0 0.1 0.05 -0.5" size="0.03" mass="0.8"/>
    </body>
  </worldbody>
</mujoco>
"""

ALL = {
    "pendulum": PENDULUM,
    "acrobot": ACROBOT,
    "mixed": MIXED,
    "free_body": FREE_BODY,
    "ball_pendulum": BALL_PENDULUM,
}
