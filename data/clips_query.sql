SELECT *
FROM clips
-- a_or_b lines must be labeled for the clip to be relevant to the experiment
WHERE (a_or_b_lines IS NOT NULL)
    -- homogeneous clips are required to correctly train the frame classifier
    AND (frame_homogeneity IS NULL)
    -- patient-grouped splitting requires a patient id
    AND (patient_id IS NOT NULL)
    -- downstream table joins require exam and video ids
    AND (exam_id IS NOT NULL)
    AND (vid_id IS NOT NULL)
