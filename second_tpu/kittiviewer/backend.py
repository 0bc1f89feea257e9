"""Point-cloud viewer backend (reference
second/kittiviewer/backend/main.py:29-229).

Same REST surface — POST /api/readinfo, /api/read_detection,
/api/get_pointcloud, /api/build_network, /api/inference_by_idx — served
with the stdlib http.server (flask isn't bundled in the TPU image) and
CORS headers so the upstream three.js frontend also works against it.
GET / serves the bundled dependency-free canvas frontend
(frontend/index.html — BEV point/box rendering, detection loading,
live inference):

    python -m second_tpu.kittiviewer.backend main --port=16666
    # then open http://localhost:16666/
"""

import base64
import json
import pickle
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from ..core.inference import InferenceContext
from ..data import kitti_common as kitti
from ..data.dataset import get_dataset_class
from ..data import kitti_dataset  # noqa: F401  (registry)


class SecondBackend:
    def __init__(self):
        self.root_path = None
        self.image_idxes = None
        self.dt_annos = None
        self.dataset = None
        self.inference_ctx = None


BACKEND = SecondBackend()


def error_response(msg):
    print("[ERROR]" + msg)
    return {"status": "error", "message": "[ERROR]" + msg}


def readinfo(instance):
    root_path = Path(instance["root_path"])
    BACKEND.root_path = root_path
    info_path = Path(instance["info_path"])
    dataset_class_name = instance.get("dataset_class_name", "KittiDataset")
    BACKEND.dataset = get_dataset_class(dataset_class_name)(
        root_path=root_path, info_path=info_path)
    BACKEND.image_idxes = list(range(len(BACKEND.dataset)))
    return {"status": "normal", "image_indexes": BACKEND.image_idxes}


def read_detection(instance):
    if BACKEND.root_path is None:
        return error_response("root path is not set")
    det_path = Path(instance["det_path"])
    if det_path.is_file():
        with open(det_path, "rb") as f:
            BACKEND.dt_annos = pickle.load(f)
    else:
        BACKEND.dt_annos = kitti.get_label_annos(det_path)
    return {"status": "normal"}


def get_pointcloud(instance):
    if BACKEND.root_path is None:
        return error_response("root path is not set")
    image_idx = instance["image_idx"]
    idx = BACKEND.image_idxes.index(image_idx)
    sensor_data = BACKEND.dataset.get_sensor_data(idx)
    response = {"status": "normal"}
    if "annotations" in sensor_data["lidar"]:
        annos = sensor_data["lidar"]["annotations"]
        gt_boxes = annos["boxes"].copy()
        response["locs"] = gt_boxes[:, :3].tolist()
        response["dims"] = gt_boxes[:, 3:6].tolist()
        rots = np.concatenate(
            [np.zeros([gt_boxes.shape[0], 2], dtype=np.float32),
             -gt_boxes[:, 6:7]], axis=1)
        response["rots"] = rots.tolist()
        response["labels"] = annos["names"].tolist()
    response["num_features"] = 3
    points = sensor_data["lidar"]["points"][:, :3]
    if instance.get("enable_int16"):
        points = (points * instance["int16_factor"]).astype(np.int16)
    response["pointcloud"] = base64.b64encode(
        points.tobytes()).decode("utf-8")
    return response


def get_image(instance):
    if BACKEND.root_path is None:
        return error_response("root path is not set")
    idx = BACKEND.image_idxes.index(instance["image_idx"])
    query = {"lidar": {"idx": idx}, "cam": {}}
    sensor_data = BACKEND.dataset.get_sensor_data(query)
    if "cam" in sensor_data and "data" in sensor_data["cam"]:
        image_str = sensor_data["cam"]["data"]
        return {
            "status": "normal",
            "image_b64": (
                "data:image/{};base64,".format(sensor_data["cam"]["datatype"])
                + base64.b64encode(image_str).decode("utf-8")),
        }
    return error_response("no image in dataset")


def build_network_(instance):
    cfg_path = Path(instance["config_path"])
    ckpt_path = instance["checkpoint_path"]
    if not cfg_path.exists():
        return error_response("config file not exist.")
    ctx = InferenceContext()
    ctx.build(str(cfg_path))
    if ckpt_path:
        ctx.restore(ckpt_path)
    else:
        ctx.init_random()
    BACKEND.inference_ctx = ctx
    return {"status": "normal"}


def inference_by_idx(instance):
    if BACKEND.inference_ctx is None:
        return error_response("inference context not built")
    idx = BACKEND.image_idxes.index(instance["image_idx"])
    sensor_data = BACKEND.dataset.get_sensor_data(idx)
    points = sensor_data["lidar"]["points"]
    info = {"image": {"image_idx": instance["image_idx"]}}
    if "calib" in sensor_data and sensor_data["calib"] is not None:
        info["calib"] = {
            "R0_rect": sensor_data["calib"]["rect"],
            "Tr_velo_to_cam": sensor_data["calib"]["Trv2c"],
            "P2": sensor_data["calib"]["P2"],
        }
    example = BACKEND.inference_ctx.get_inference_input_dict(info, points)
    dets = BACKEND.inference_ctx.inference(example)[0]
    boxes = np.asarray(dets["box3d_lidar"])
    response = {
        "status": "normal",
        "dt_locs": boxes[:, :3].tolist(),
        "dt_dims": boxes[:, 3:6].tolist(),
        "dt_rots": np.concatenate(
            [np.zeros([boxes.shape[0], 2], dtype=np.float32),
             -boxes[:, 6:7]], axis=1).tolist(),
        "dt_labels": np.asarray(dets["label_preds"]).tolist(),
        "dt_scores": np.asarray(dets["scores"]).tolist(),
    }
    return response


ROUTES = {
    "/api/readinfo": readinfo,
    "/api/read_detection": read_detection,
    "/api/get_pointcloud": get_pointcloud,
    "/api/get_image": get_image,
    "/api/build_network": build_network_,
    "/api/inference_by_idx": inference_by_idx,
}


class Handler(BaseHTTPRequestHandler):
    def _send(self, payload, code=200):
        body = json.dumps({"results": [payload]}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Headers", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        """Serve the bundled canvas frontend (frontend/index.html)."""
        if self.path in ("/", "/index.html"):
            page = Path(__file__).parent / "frontend" / "index.html"
            body = page.read_bytes()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        self.send_response(404)
        self.end_headers()

    def do_OPTIONS(self):
        self.send_response(204)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Headers", "*")
        self.send_header("Access-Control-Allow-Methods", "POST, OPTIONS")
        self.end_headers()

    def do_POST(self):
        handler = ROUTES.get(self.path)
        if handler is None:
            self._send(error_response(f"unknown route {self.path}"), 404)
            return
        length = int(self.headers.get("Content-Length", 0))
        try:
            instance = json.loads(self.rfile.read(length) or b"{}")
            self._send(handler(instance))
        except Exception as e:  # surface errors to the frontend
            self._send(error_response(f"{type(e).__name__}: {e}"), 500)

    def log_message(self, fmt, *args):
        print("[viewer]", fmt % args)


def main(port=16666, host=""):
    server = ThreadingHTTPServer((host, int(port)), Handler)
    print(f"kittiviewer backend listening on :{port}")
    server.serve_forever()


if __name__ == "__main__":
    from ..utils.fire_lite import fire

    fire({"main": main})
