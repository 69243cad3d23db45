from nice_slam_tpu.mesh.mesher import Mesher, MesherConfig, save_ply, load_ply
