"""Offline face-landmark extraction (reference: data/face_landmark_detection.py).

Walks `<dataroot>/<phase>_img/<seq>/*.jpg|png`, detects 68-point landmarks
per frame, and writes the csv `.txt` files the FaceDataset consumes into
`<dataroot>/<phase>_keypoints/<seq>/`.

Backends (first available wins):
  - dlib shape_predictor_68 (the reference's detector) if dlib + the model
    file are installed;
  - cv2.face.createFacemarkLBF with an LBF model file;
otherwise exits with instructions — landmark models are external data and
cannot be bundled.
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def detect_with_dlib(predictor_path: str):
    import dlib

    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(predictor_path)

    def run(img: np.ndarray) -> np.ndarray | None:
        dets = detector(img, 1)
        if not dets:
            return None
        shape = predictor(img, dets[0])
        return np.array([[p.x, p.y] for p in shape.parts()], np.float32)

    return run


def detect_with_cv2(model_path: str):
    import cv2

    facemark = cv2.face.createFacemarkLBF()
    facemark.loadModel(model_path)
    cascade = cv2.CascadeClassifier(
        cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
    )

    def run(img: np.ndarray) -> np.ndarray | None:
        faces = cascade.detectMultiScale(img, 1.3, 5)
        if len(faces) == 0:
            return None
        ok, landmarks = facemark.fit(img, np.asarray(faces[:1]))
        if not ok:
            return None
        return landmarks[0][0].astype(np.float32)

    return run


def main(argv=None):
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--phase", default="train")
    p.add_argument("--dlib-model", default="shape_predictor_68_face_landmarks.dat")
    p.add_argument("--lbf-model", default="lbfmodel.yaml")
    args = p.parse_args(argv)

    detect = None
    if os.path.exists(args.dlib_model):
        try:
            detect = detect_with_dlib(args.dlib_model)
            print("using dlib landmark detector")
        except ImportError:
            pass
    if detect is None and os.path.exists(args.lbf_model):
        try:
            detect = detect_with_cv2(args.lbf_model)
            print("using cv2 LBF landmark detector")
        except Exception:
            pass
    if detect is None:
        raise SystemExit(
            "no landmark backend available: install dlib + "
            "shape_predictor_68_face_landmarks.dat (the reference's setup) "
            "or provide an OpenCV LBF model via --lbf-model"
        )

    img_root = os.path.join(args.dataroot, f"{args.phase}_img")
    kp_root = os.path.join(args.dataroot, f"{args.phase}_keypoints")
    n_done = n_miss = 0
    for seq in sorted(os.listdir(img_root)):
        in_dir = os.path.join(img_root, seq)
        if not os.path.isdir(in_dir):
            continue
        out_dir = os.path.join(kp_root, seq)
        os.makedirs(out_dir, exist_ok=True)
        for f in sorted(glob.glob(os.path.join(in_dir, "*"))):
            img = np.asarray(Image.open(f).convert("RGB"))
            pts = detect(img)
            name = os.path.splitext(os.path.basename(f))[0] + ".txt"
            if pts is None:
                n_miss += 1
                continue
            np.savetxt(os.path.join(out_dir, name), pts, fmt="%.2f", delimiter=",")
            n_done += 1
    print(f"landmarks written: {n_done} frames ({n_miss} without detections)")


if __name__ == "__main__":
    main()
