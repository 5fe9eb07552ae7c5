% Batched HDF5 shard creation demo — write a dataset too big to hold in
% memory in chunks, read a slice back, verify, and emit the list.txt an
% HDF5Data layer takes as its source.  Same workflow as the reference
% matlab/hdf5creation/demo.m (body rewritten for the tpu port).

%% WRITING TO HDF5
filename = 'trial.h5';

num_total_samples = 10000;
% stand-ins for data that would stream from disk / a generator
data_disk = rand(5, 5, 1, num_total_samples);
label_disk = rand(10, num_total_samples);

chunksz = 100;
created_flag = false;
totalct = 0;
for batchno = 1:num_total_samples / chunksz
  fprintf('batch no. %d\n', batchno);
  last_read = (batchno - 1) * chunksz;

  % only ever hold one chunk in memory
  batchdata = data_disk(:, :, 1, last_read + 1:last_read + chunksz);
  batchlabs = label_disk(:, last_read + 1:last_read + chunksz);

  startloc = struct('dat', [1, 1, 1, totalct + 1], 'lab', [1, totalct + 1]);
  curr_dat_sz = store2hdf5(filename, batchdata, batchlabs, ...
    ~created_flag, startloc, chunksz);
  created_flag = true;            % create once, append thereafter
  totalct = curr_dat_sz(end);     % samples stored so far
end

% show what landed on disk
h5disp(filename);

%% READING FROM HDF5

% pull samples #1000..1999 back out and check them round-trip
data_rd = h5read(filename, '/data', [1 1 1 1000], [5, 5, 1, 1000]);
label_rd = h5read(filename, '/label', [1 1000], [10, 1000]);
fprintf('Testing ...\n');
try
  assert(isequal(data_rd, single(data_disk(:, :, :, 1000:1999))), ...
    'Data do not match');
  assert(isequal(label_rd, single(label_disk(:, 1000:1999))), ...
    'Labels do not match');
  fprintf('Success!\n');
catch err
  fprintf('Test failed ...\n');
  getReport(err)
end

% list.txt names the shard(s); point hdf5_data_param.source at it:
%   layer { name: "data" type: "HDF5Data" top: "data" top: "labelvec"
%           hdf5_data_param { source: "/path/to/list.txt" batch_size: 64 } }
FILE = fopen('list.txt', 'w');
fprintf(FILE, '%s', filename);
fclose(FILE);
fprintf('HDF5 filename listed in %s \n', 'list.txt');
